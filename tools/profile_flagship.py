"""Trace the flagship train step and print a per-op device-time table.

Captures a jax.profiler trace of K production train steps (same graph as
bench.py / tools/ab_flagship.py), parses the xplane with
jax.profiler.ProfileData, and aggregates device-plane event durations by op
category — the evidence base for deciding where the next flagship
milliseconds live (CLAUDE.md: no blind kernel rewrites).

    python tools/profile_flagship.py [--k 3] [--out /tmp/flagship_trace]

Prints one line per op bucket: total ms across the trace, ms per step, and
share of the step. Works through the axon tunnel (device events are
reported by the remote PJRT plugin; if the device plane is empty the
script says so instead of printing host noise).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(k: int, out_dir: str, batch: int, remat: bool) -> None:
    from tools.ab_flagship import build_step
    import jax

    timed, _ = build_step(batch, 8, 49, 64, remat)
    timed(k)            # compile + warm
    timed(k)
    with jax.profiler.trace(out_dir):
        timed(k)


# Container ops whose duration spans their whole body: counting them on top
# of their leaf ops double-counts the step (a batch-32 trace summed to 8x
# the wall time before this filter existed).
_CONTAINER = re.compile(r"^%?(while|conditional|call|jit_|\d+$)")


def _opcode(event_name: str):
    """(instr_name, opcode) from a full HLO event string.

    Event text is '%name.N = <type> opcode(operands...)'; bucketing must key
    on the instruction's own name/opcode, NOT a regex over the whole string
    (operand text like '%copy-done.3' used to drag conv fusions into the
    copy bucket).
    """
    m = re.match(r"%?([\w.-]+)", event_name)
    instr = m.group(1) if m else event_name
    op = None
    parts = event_name.split(" = ", 1)
    if len(parts) == 2:
        # the opcode is the identifier between the result type's closing
        # brace/paren and its operand list's '('
        m2 = re.search(r"[)}\]]\s+([a-z][\w-]*)\(", parts[1])
        if m2:
            op = m2.group(1)
    return instr, op


def _bucket(event_name: str, result_hw_padded: bool) -> str:
    instr, op = _opcode(event_name)
    if op == "custom-call":
        if "walk" in instr:
            return "pallas: fused walk"
        return "pallas: rconv kernels (fwd/dx/dw)"
    if op in ("convolution", "conv"):
        return "XLA conv (fwd/dx/dw)"
    if op == "fusion":
        if instr.startswith("convert_reduce_fusion"):
            return "BN stats/reduce fusions"
        if instr.startswith("multiply_add_fusion"):
            return "dW cast + optimizer fusions"
        if result_hw_padded:
            return "reflect-pad materializing fusions"
        return "other fusions (epilogue/elementwise)"
    if op in ("copy", "copy-start", "copy-done"):
        return "sync copies"
    if op == "select-and-scatter":
        return "maxpool backward"
    if op and ("reduce" in op):
        return "BN stats/reduce fusions"
    if op == "dot":
        return "matmul/dot"
    return "all others"


_PAD_SHAPE = re.compile(r"= \S*\[\d+,(\d+),(\d+),\d+\]")


def _result_hw_padded(event_name: str) -> bool:
    """True when the result is an NHWC tensor with H==W not a multiple of 8
    (the reflect-pad materializations produce (H+2)x(W+2) maps)."""
    m = _PAD_SHAPE.search(event_name)
    if not m:
        return False
    h, w = int(m.group(1)), int(m.group(2))
    return h == w and h % 8 == 2


def report(out_dir: str, k: int) -> None:
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb found under", out_dir)
        return
    data = ProfileData.from_file(max(paths, key=os.path.getmtime))
    dev_planes = [p for p in data.planes
                  if "TPU" in p.name or "/device" in p.name.lower()]
    if not dev_planes:
        print("planes found:", [p.name for p in data.planes])
        print("NO DEVICE PLANE — tunnel profiler reports host only")
        return
    for plane in dev_planes:
        lines = {ln.name: ln for ln in plane.lines}
        ops_line = lines.get("XLA Ops")
        if ops_line is None:
            continue
        wall = sum(ev.duration_ns for ev in lines["XLA Modules"].events) \
            if "XLA Modules" in lines else None
        async_ns = sum(ev.duration_ns
                       for ev in lines["Async XLA Ops"].events) \
            if "Async XLA Ops" in lines else 0

        agg = collections.Counter()
        nbyname = collections.Counter()
        total = 0
        for ev in ops_line.events:
            short = ev.name.split(" = ")[0]
            if _CONTAINER.match(short):
                continue  # spans its body; leaves are counted below it
            agg[ev.name] += ev.duration_ns
            nbyname[ev.name] += 1
            total += ev.duration_ns
        hdr = f"{total/1e6/k:.1f} ms/step leaf-op device time over {k} steps"
        if wall:
            hdr += f" (module wall {wall/1e6/k:.1f} ms/step)"
        print(f"\n== plane: {plane.name} — {hdr} ==")
        if async_ns:
            print(f"   async DMA outstanding (overlapped, NOT additive): "
                  f"{async_ns/1e6/k:.1f} ms/step")
        print(f"{'ms/step':>9}  {'%':>5}  {'calls':>6}  op")
        shown = 0
        for name, dur in agg.most_common(40):
            pct = 100.0 * dur / max(total, 1)
            print(f"{dur/1e6/k:9.3f}  {pct:5.1f}  {nbyname[name]:6d}  "
                  f"{name[:100]}")
            shown += dur
            if shown > 0.97 * total:
                break
        # bucket rollup
        rolled = collections.Counter()
        for name, dur in agg.items():
            rolled[_bucket(name, _result_hw_padded(name))] += dur
        print("\n-- rollup (leaf ops) --")
        for label, dur in rolled.most_common():
            print(f"{dur/1e6/k:9.3f}  {100.0*dur/max(total,1):5.1f}  {label}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--out", default="/tmp/flagship_trace")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip capture; parse an existing trace dir")
    args = ap.parse_args()

    from videowalk_tpu.utils.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    if not args.parse_only:
        capture(args.k, args.out, args.batch, args.remat)
    report(args.out, args.k)


if __name__ == "__main__":
    main()
