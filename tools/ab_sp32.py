"""A/B: route the 32x32 layer3/4 interiors through the rconv kernel at the
superpixel config (VIDEOWALK_RCONV_ALLOW32).

The auto gate routes only 8x8 interiors — the geometry the flagship
measurements covered (ops/reflect_conv.py::rconv_kernel_routes). At the
superpixel config of record (256px whole images, tools/bench_sp.py),
layer3/4 run 32x32 — a shape ``rconv_supported`` covers but no measurement
ever has. This tool times the sp (and optionally sp_dil) step same-process
under:

  base      — auto gates (no kernel routing at 256px; BN fuse inert)
  a32       — ALLOW32=1: layer4 32x32x512 interiors through the kernel,
              which also arms the BN-stats/input-affine fusion chain there
              (models/resnet.py gates share rconv_kernel_routes)
  a32_c256  — + MIN_C=256: layer3 32x32x256 interiors too
  base2     — auto again (A/B/A drift check)

Each variant builds its OWN traced step with the env applied first (the
gates are trace-time), then the k2-k1 difference quotient with float-fetch
sync (CLAUDE.md measurement rules).

VERDICT (v5e, 2026-08-20, three same-process A/B/As): a32 WINS and is
ADOPTED as the auto default — sp 25.12-25.21 vs base 25.41-25.68 ms
(~1.4%), sp_dil 32.49 vs 32.87-32.93; every a32 round beat every base
round. a32_c256 (layer3 too) split across runs (25.16 best / 25.28 mid) —
NEUTRAL, min_c stays 512. The 8x8 flagship lesson ("layer3 routing loses
in-context") does NOT transfer to 32x32: M=1024 rows/image fill the MXU
where 8x8's M=64 ran K=256 starved.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# ALLOW32 defaults ON since adoption (2026-08-20 A/Bs below); "base" is
# the kernel-off point via the kill switch.
VARIANTS = [
    ("base", {"VIDEOWALK_RCONV_ALLOW32": "0"}),
    ("a32", {"VIDEOWALK_RCONV_ALLOW32": "1"}),
    ("a32_c256", {"VIDEOWALK_RCONV_ALLOW32": "1",
                  "VIDEOWALK_RCONV_MIN_C": "256"}),
    ("base2", {"VIDEOWALK_RCONV_ALLOW32": "0"}),
]
_KNOBS = ("VIDEOWALK_RCONV_ALLOW32", "VIDEOWALK_RCONV_MIN_C")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="sp", choices=("sp", "sp_dil"))
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=12)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/videowalk_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    print("# devices:", jax.devices(), flush=True)

    import bench_sp

    results = {}
    for name, env in VARIANTS:
        for k in _KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)
        ms = bench_sp.time_variant(args.variant, args.k1, args.k2,
                                   args.rounds)
        results[name] = [round(m, 2) for m in ms]
        print(json.dumps({"variant": name, "env": env,
                          "step_ms": results[name],
                          "mean_ms": round(float(np.mean(ms)), 2)}),
              flush=True)

    print(json.dumps({k: round(float(np.mean(v)), 2)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
