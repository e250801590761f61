"""Decompose the driver-vs-harness propagation gap (VERDICT r4 #7).

STATUS round-4 item 10: the eval driver spends ~55 ms/target at DAVIS-480p
while the difference-quotient harness (tools/time_prop.py) measures the
same scan at ~18 ms/target — a fixed ~2.2 s/video cost the quotient
cancels. This tool reproduces the DRIVER's exact per-video call
(``propagate_labels_bucketed`` on device-resident features, one video,
warm cache) and splits the wall time into additive phases:

  pad      — the bucket-padding jnp concats (synced by a 1-element fetch)
  call     — propagate_labels enqueue (host time until dispatch returns)
  sync     — 1-element fetch after enqueue = on-device scan compute
             + tunnel round-trip latency
  fetch    — np.asarray(preds): the full prediction-stack transfer
  total    — one warm propagate_labels_bucketed call (the driver's t03
             line), measured separately as a cross-check

plus the harness-style difference quotient in the SAME process, so
(total - quotient * n_targets) is the fixed cost being attributed.

Reference analogue: /root/reference/code/test.py:128-160 (its per-frame
loop pays dispatch+fetch per target; this driver pays per video).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=60)
    ap.add_argument("--W", type=int, default=107)
    ap.add_argument("--C", type=int, default=512)
    ap.add_argument("--n-lbl", type=int, default=4)
    ap.add_argument("--n-context", type=int, default=20)
    ap.add_argument("--n-targets", type=int, default=60)
    ap.add_argument("--radius", type=float, default=12.0)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from videowalk_tpu.utils.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/videowalk_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from videowalk_tpu.eval.propagation import (context_index_bank,
                                                propagate_labels,
                                                propagate_labels_bucketed)

    print(f"# devices: {jax.devices()}", flush=True)
    backend = "sparse" if jax.default_backend() == "tpu" else "xla"

    H, W, C, n_lbl = args.H, args.W, args.C, args.n_lbl
    n_context, n_targets = args.n_context, args.n_targets
    N = n_targets + n_context
    rng = np.random.RandomState(0)
    feats_np = rng.randn(N, C, H, W).astype(np.float32)
    feats_np /= np.linalg.norm(feats_np, axis=1, keepdims=True) + 1e-6
    labels_np = np.zeros((N, H, W, n_lbl), np.float32)
    labels_np[..., 0] = 1.0
    labels_np[:n_context + 1, :, : W // 2, 0] = 0.0
    labels_np[:n_context + 1, :, : W // 2, 1] = 1.0
    feats = jnp.asarray(feats_np)       # device-resident, like encode_video's output
    labels0 = jnp.asarray(labels_np)
    key_indices = context_index_bank(n_context, [0], n_targets)

    kw = dict(n_context=n_context, n_long=1, topk=args.topk,
              temperature=0.05, radius=args.radius, backend=backend)

    def total_call():
        t0 = time.perf_counter()
        preds = propagate_labels_bucketed(
            feats, labels0, np.asarray(key_indices), **kw)
        assert np.isfinite(preds.sum())
        return time.perf_counter() - t0

    # warm every shape (bucketed pads targets to a multiple of 16)
    total_call()
    total_call()

    # ---- phase split (replicating bucketed's internals at this geometry;
    # n_targets=60 -> pads to 64 with repeated last rows, labels 4 -> 8)
    def phases():
        out = {}
        t0 = time.perf_counter()
        pt = (-n_targets) % 16
        ki = np.concatenate([key_indices,
                             np.repeat(key_indices[-1:], pt, axis=0)])
        f = jnp.concatenate([feats, jnp.zeros((pt, *feats.shape[1:]),
                                              feats.dtype)])
        l = jnp.concatenate([labels0, jnp.zeros((pt, *labels0.shape[1:]),
                                                labels0.dtype)])
        pl = (-n_lbl) % 8
        l = jnp.concatenate([l, jnp.zeros((*l.shape[:-1], pl), l.dtype)],
                            axis=-1)
        _ = float(f[0, 0, 0, 0])        # sync the pads
        out["pad_ms"] = (time.perf_counter() - t0) * 1e3

        from videowalk_tpu.ops.prop_sparse_kernel import (sparse_tile,
                                                          sparse_topk_form)

        tile = topk_form = None
        if backend == "sparse":
            tile, topk_form = sparse_tile(), sparse_topk_form()
        t0 = time.perf_counter()
        preds = propagate_labels(f, l, jnp.asarray(ki), tile=tile,
                                 topk_form=topk_form, **kw)
        out["call_ms"] = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        _ = float(preds[0, 0, 0, 0])    # completes compute + min transfer
        out["sync_ms"] = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        arr = np.asarray(preds)
        out["fetch_ms"] = (time.perf_counter() - t0) * 1e3
        out["fetch_mb"] = round(arr.nbytes / 1e6, 1)
        return out

    phases()  # warm this exact split too
    results = []
    for r in range(args.rounds):
        p = phases()
        p["total_ms"] = total_call() * 1e3
        results.append(p)
        print(json.dumps({k: round(v, 1) for k, v in p.items()}), flush=True)

    # ---- harness-style difference quotient in the same process
    n1, n2 = 12, 44   # multiples of nothing: bucketed pads to 16/48
    banks = {n: jnp.asarray(context_index_bank(n_context, [0], n))
             for n in (n1, n2)}
    from videowalk_tpu.ops.prop_sparse_kernel import (sparse_tile,
                                                      sparse_topk_form)

    if backend == "sparse":
        tile, topk_form = sparse_tile(), sparse_topk_form()
    else:
        tile = topk_form = None

    def quotient_once():
        def timed(n):
            t0 = time.perf_counter()
            preds = propagate_labels(feats[: n + n_context], labels0[: n + n_context],
                                     banks[n], tile=tile,
                                     topk_form=topk_form, **kw)
            assert np.isfinite(float(preds.sum()))
            return time.perf_counter() - t0

        t1, t2 = timed(n1), timed(n2)
        return (t2 - t1) / (n2 - n1) * 1e3

    quotient_once(); quotient_once()
    quotients = [quotient_once() for _ in range(args.rounds)]

    mean = {k: float(np.mean([r[k] for r in results]))
            for k in results[0]}
    q = float(np.mean(quotients))
    summary = {
        "backend": backend,
        "n_targets": n_targets,
        "per_video_ms": {k: round(v, 1) for k, v in mean.items()},
        "ms_per_target_driver": round(mean["total_ms"] / n_targets, 1),
        "ms_per_target_quotient": round(q, 1),
        "fixed_cost_ms": round(mean["total_ms"] - q * n_targets, 1),
        "note": "pad+call+sync+fetch measured on a separate split pass; "
                "total is one warm bucketed call like the driver's t03",
    }
    print("\n== summary ==")
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
