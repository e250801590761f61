"""Same-process timing harness for the label-propagation backends.

    python tools/time_prop.py --geometry davis --radius 12 \
        --backend sparse --backend tiled

Times ``propagate_labels`` (the production scan, jitted whole) at a chosen
eval geometry via the difference quotient between an N1-target and an
N2-target scan — cancels fixed dispatch/fetch cost, reports ms per target
frame. Sync is a real device->host ``float()`` fetch (CLAUDE.md measurement
rules; ``jax.block_until_ready`` is a no-op through the axon tunnel).

Geometries: davis = 480p at feature stride 8 (60x107, C=512, 4 label
channels, videoLen 20); jhmdb = 320px (40x40, C=512, 16 heatmap channels,
videoLen 8, like eval/test.sh's pose config).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GEOMS = {
    "davis": dict(H=60, W=107, C=512, n_lbl=4, n_context=20),
    # JHMDB pose evals run --remove-layers layer4 (C=256; 15 joint heatmaps
    # + background = 16 label channels)
    "jhmdb": dict(H=40, W=40, C=256, n_lbl=16, n_context=8),
}


def parse_variant(spec):
    """'sparse' or 'sparse:tile=16,topk_form=loop' -> (backend, kwargs)."""
    backend, _, opts = spec.partition(":")
    kwargs = {}
    if opts:
        for kv in opts.split(","):
            k, _, v = kv.partition("=")
            if k == "tile":
                kwargs["tile"] = int(v)
            elif k == "topk_form":
                kwargs["topk_form"] = v
            else:
                raise SystemExit(f"unknown variant option {k!r} in {spec!r}")
    return backend, kwargs


def build(geom, spec, radius, topk, n1, n2):
    import jax
    import jax.numpy as jnp

    from videowalk_tpu.eval.propagation import (context_index_bank,
                                                propagate_labels)

    backend, vkw = parse_variant(spec)

    H, W, C, n_lbl, n_context = (geom[k] for k in
                                 ("H", "W", "C", "n_lbl", "n_context"))
    n_targets = max(n1, n2)
    N = n_targets + n_context + 1
    rng = np.random.RandomState(0)
    feats = rng.randn(N, C, H, W).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True) + 1e-6
    labels = np.zeros((N, H, W, n_lbl), np.float32)
    labels[..., 0] = 1.0
    labels[:n_context + 1, :, : W // 2, 0] = 0.0
    labels[:n_context + 1, :, : W // 2, 1] = 1.0
    feats = jnp.asarray(feats)
    labels = jnp.asarray(labels)

    banks = {n: jnp.asarray(context_index_bank(n_context, [0], n))
             for n in (n1, n2)}

    run = jax.jit(partial(
        propagate_labels, n_context=n_context, n_long=1, topk=topk,
        temperature=0.05, radius=radius, backend=backend, **vkw))

    def timed(n):
        t0 = time.perf_counter()
        preds = run(feats, labels, banks[n])
        s = float(preds.sum())   # real fetch sync
        assert np.isfinite(s)
        return time.perf_counter() - t0

    return timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", choices=list(GEOMS), default="davis")
    ap.add_argument("--backend", action="append", required=True,
                    help="sparse | tiled | windowed | xla (repeatable); "
                         "sparse variants take options, e.g. "
                         "'sparse:tile=16,topk_form=loop' — all variants "
                         "run interleaved in THIS process")
    ap.add_argument("--radius", type=float, default=12.0)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--n2", type=int, default=28)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from videowalk_tpu.utils.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    import jax

    # Persistent compile cache: a tile-16 Mosaic compile can cost many
    # minutes through the tunnel — never lose a successful one.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/videowalk_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # pragma: no cover
        print(f"# compile cache unavailable: {e}", flush=True)

    print(f"# devices: {jax.devices()}  geometry={args.geometry} "
          f"radius={args.radius}", flush=True)
    geom = GEOMS[args.geometry]
    timers = {}
    for b in args.backend:
        timers[b] = build(geom, b, args.radius, args.topk, args.n1, args.n2)
        timers[b](args.n1)   # compile both scan lengths
        timers[b](args.n2)

    per = {b: [] for b in timers}
    for r in range(args.rounds):
        for b, timed in timers.items():
            t1 = timed(args.n1)
            t2 = timed(args.n2)
            ms = (t2 - t1) / (args.n2 - args.n1) * 1e3
            per[b].append(ms)
            print(json.dumps({"backend": b, "round": r,
                              "ms_per_target": round(ms, 2)}), flush=True)
    print("\n== summary (ms/target, lower is better) ==")
    for b, ms in sorted(per.items(), key=lambda kv: min(kv[1])):
        print(json.dumps({"backend": b, "min": round(min(ms), 2),
                          "mean": round(float(np.mean(ms)), 2)}))


if __name__ == "__main__":
    main()
