"""Benchmark: clips/sec/chip on the 8-frame palindrome CRW train step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches BASELINE.json config 2 ("patch-grid CRW at scale: 8-frame
palindromes, edge dropout, batch 32") scaled per chip. The reference repo
publishes no throughput number (BASELINE.md: the `clips/s` meter exists but
no value is recorded), so ``vs_baseline`` is measured against the recorded
round-1 baseline in ``BENCH_BASELINE.json`` (written on first run) — it
tracks this framework's perf progression across rounds.

Measurement: this dev environment reaches the TPU through a tunnel with
~25 ms fixed dispatch+fetch latency, so K train steps run inside ONE jitted
``lax.fori_loop`` and throughput is the difference quotient between a K1-step
and a K2-step call (cancels the fixed tunnel cost and measures pure on-chip
step time).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")

# Flagship bench config: 8-frame palindrome, 7x7 grid of 64px patches
# (the reference's default --patch-size 64 on 256px frames), edge dropout
# 0.1, temp 0.05 (code/train.sh:15-22; BASELINE.json asks for 8-frame).
CLIP_LEN = 8
N_PATCHES = 49
PATCH = 64
# BASELINE.json config 2 states batch 32 + --remat; the default bench batch
# is 8 (VERDICT r1: tunnel transfer makes 32 impractical as the every-round
# default). Override for the at-scale data point:
#   VIDEOWALK_BENCH_BATCH=32 VIDEOWALK_BENCH_REMAT=1 python bench.py
BATCH = int(os.environ.get("VIDEOWALK_BENCH_BATCH", "8"))
REMAT = os.environ.get("VIDEOWALK_BENCH_REMAT", "") not in ("", "0")
# Batch-32 remat ladder (v5e, 2026-08-19, same-process interleaved):
# off 552.2 ms (58.0 clips/s, 13.36 GiB temp) | layer1 543.5 (58.9, 13.17)
# | layer1,layer2 543.8 (58.8, 12.79) | layer1..3 552.5 (57.9, 11.32) |
# full 636.6 (50.3, 10.53). Selective remat of layer1 ONLY is the winner —
# recomputing the cheap-FLOPs/large-bytes stage beats storing it — so it
# is the bench default whenever remat is on (override via env).
REMAT_STAGES = os.environ.get("VIDEOWALK_BENCH_REMAT_STAGES", "layer1")
K1, K2 = 2, 12


def main():
    import jax

    # Persistent compilation cache: tunnel compiles cost minutes; repeat
    # bench runs (and the driver's round-end run) hit the cache instead.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/videowalk_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from videowalk_tpu.models import CRW, CRWConfig
    from videowalk_tpu.parallel import create_train_state, make_optimizer

    model = CRW(CRWConfig(model_type="scratch", temperature=0.05,
                          edgedrop_rate=0.1, dtype=jnp.bfloat16,
                          remat=REMAT,
                          remat_stages=REMAT_STAGES if REMAT else None))
    optimizer = make_optimizer(lr=3e-4)

    rng = np.random.RandomState(0)
    batch = jnp.asarray(
        rng.randn(BATCH, CLIP_LEN, N_PATCHES, PATCH, PATCH, 3)
        .astype(np.float32))

    state = create_train_state(model, optimizer, batch[:1],
                               jax.random.PRNGKey(0))

    def one_step(state, batch, key):
        def loss_fn(params, batch_stats):
            (q, loss, diags), upd = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch,
                train=True, rngs={"dropout": key}, mutable=["batch_stats"])
            return loss, upd.get("batch_stats", batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        import optax
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, batch_stats=new_stats,
                             opt_state=opt_state, step=state.step + 1), loss

    # batch is an explicit jit ARG, not a closure: closed-over arrays embed
    # as constants in the lowered module, and at batch 32 the 2.5 GB body
    # exceeds the remote compiler's request limit (HTTP 413).
    @partial(jax.jit, static_argnums=(3,))
    def run_k(state, batch, key, k):
        def body(i, carry):
            st, _ = carry
            st, loss = one_step(st, batch, jax.random.fold_in(key, i))
            return st, loss

        return jax.lax.fori_loop(0, k, body, (state, jnp.float32(0)))

    key = jax.random.PRNGKey(1)

    def timed(k):
        t0 = time.perf_counter()
        st, loss = run_k(state, batch, key, k)
        _ = float(loss)  # force the tunnel round trip
        return time.perf_counter() - t0, float(loss)

    timed(K1)  # compile both variants
    timed(K2)
    t1, loss1 = timed(K1)
    t2, loss2 = timed(K2)
    assert np.isfinite(loss2), f"non-finite bench loss {loss2}"

    step_time = (t2 - t1) / (K2 - K1)
    n_chips = max(1, len(jax.devices()))
    clips_per_sec_per_chip = BATCH / step_time / n_chips

    # MFU: ANALYTIC model FLOPs of one train step (conv fwd x3 for
    # fwd+dx+dw — the standard MFU convention: useful model FLOPs, excluding
    # remat recompute) against the chip's dense peak. The numerator counts
    # conv FLOPs only; everything excluded is quantified at ~0.11% of it
    # (per step at any batch: 128-d head 0.0049 TF/32 clips, walk N=49
    # affinity+chain 0.0013 TF, BN ~4 flops/elem ~0.054 TF vs 56.6 TF of
    # conv at batch 32) — the understatement is negligible. The reference publishes
    # no throughput figure (BASELINE.md), so MFU is the absolute anchor the
    # clips/s progression is judged against (VERDICT r2 weak #1). XLA's
    # cost_analysis is reported alongside when available, but it cannot be
    # the MFU numerator: Pallas custom calls (the fused walk / reflect-conv
    # kernels) hide their FLOPs from it, and remat inflates it.
    def conv_fwd_flops_per_image():
        # modified ResNet-18 at 64px patches (stride-1 layer3/4,
        # reference code/resnet.py:21-41): per-conv 2*H*W*K*K*Cin*Cout.
        f = 2 * 32 * 32 * 49 * 3 * 64                      # stem 7x7/2
        f += 4 * 2 * 16 * 16 * 9 * 64 * 64                 # layer1
        f += (2 * 8 * 8 * 9 * 64 * 128 + 2 * 8 * 8 * 64 * 128
              + 3 * 2 * 8 * 8 * 9 * 128 * 128)             # layer2 (+ds)
        f += (2 * 8 * 8 * 9 * 128 * 256 + 2 * 8 * 8 * 128 * 256
              + 3 * 2 * 8 * 8 * 9 * 256 * 256)             # layer3 (+ds)
        f += (2 * 8 * 8 * 9 * 256 * 512 + 2 * 8 * 8 * 256 * 512
              + 3 * 2 * 8 * 8 * 9 * 512 * 512)             # layer4 (+ds)
        return f

    n_images = BATCH * CLIP_LEN * N_PATCHES
    analytic_flops = 3 * conv_fwd_flops_per_image() * n_images
    mfu_pct = tflops_step = None
    compiled_tflops = None
    try:
        an = run_k.lower(state, batch, key, 1).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        cf = float(an.get("flops", 0.0))
        if cf > 0:   # absent/zero means "unknown here" — omit, don't emit 0
            compiled_tflops = round(cf / 1e12, 2)
    except Exception:
        pass
    try:
        flops = float(analytic_flops)
        if flops > 0:
            kind = jax.devices()[0].device_kind.lower()
            # dense bf16 peak per chip: v5e 197 TF; v4 275 TF; CPU unknown
            peak = {"v5 lite": 197e12, "v5litepod": 197e12,
                    "tpu v4": 275e12}.get(kind, None)
            if peak is None and "v5" in kind:
                peak = 197e12
            if peak is not None:
                tflops_step = flops / 1e12
                mfu_pct = 100.0 * flops / step_time / peak
    except Exception:
        pass

    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = clips_per_sec_per_chip
        with open(BASELINE_FILE, "w") as f:
            json.dump({"metric": "clips/sec/chip",
                       "value": clips_per_sec_per_chip,
                       "note": "round-1 recorded baseline (reference "
                               "publishes no number; see BASELINE.md)"}, f)

    out = {
        "metric": "clips/sec/chip (8-frame palindrome CRW train step, "
                  "batch %d, 7x7x64px patches)" % BATCH,
        "value": round(clips_per_sec_per_chip, 3),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec_per_chip / baseline, 3),
        # vs_baseline's denominator is THIS framework's round-1 recorded
        # number (BENCH_BASELINE.json), not a reference figure — the
        # reference publishes no throughput at all (BASELINE.md).
        "baseline": "self-round1 (%.1f clips/s/chip; reference publishes "
                    "no number)" % baseline,
    }
    if mfu_pct is not None:
        out["mfu_pct"] = round(mfu_pct, 1)
        out["tflops_per_step"] = round(tflops_step, 2)
    if compiled_tflops is not None:
        out["compiled_tflops_per_step"] = compiled_tflops
    print(json.dumps(out))


if __name__ == "__main__":
    main()
