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


def _plane_events(plane):
    """Yield (name, duration_ns) over all lines of an xplane plane."""
    for line in plane.lines:
        for ev in line.events:
            yield ev.name, ev.duration_ns


BUCKETS = [
    # (label, regex on the HLO/op name)
    ("conv fwd/dx (conv_general)", r"convolution|conv_general|%conv"),
    ("conv dw (transpose conv)", r"conv.*transpose|transpose.*conv"),
    ("rconv pallas kernel", r"rconv|reflect_conv|_fwd_kernel|_dx_kernel|_dw_kernel"),
    ("walk pallas kernel", r"walk"),
    ("matmul/dot", r"dot|matmul|gemm"),
    ("batchnorm/reduce", r"batch_norm|reduce"),
    ("pad/copy/transpose", r"pad|copy|transpose|reshape|concatenate|slice"),
    ("fusion (elementwise)", r"fusion|loop_"),
    ("all others", r".*"),
]


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
        agg = collections.Counter()
        nbyname = collections.Counter()
        total = 0
        for name, dur in _plane_events(plane):
            agg[name] += dur
            nbyname[name] += 1
            total += dur
        print(f"\n== plane: {plane.name} — {total/1e6:.1f} ms total, "
              f"{total/1e6/k:.1f} ms/step over {k} steps ==")
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
            for label, pat in BUCKETS:
                if re.search(pat, name, re.I):
                    rolled[label] += dur
                    break
        print("\n-- rollup --")
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
