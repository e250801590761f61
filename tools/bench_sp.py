"""Superpixel-mode headline benchmark (VERDICT r4 #3 / BENCH_SP artifact).

The reference's central performance claim is the reduced-primitive speedup
of superpixel nodes over the 49-patch grid — ">30% faster" and "up to 5x
fewer forward passes" (/root/reference/README.md:12,30). This tool
re-measures that claim on this framework at the reference's config of
record (/root/reference/code/train.sh:15-22: clip_len 4, temp 0.05, edge
dropout 0.1, batch 6, SLIC num_sp 36 compactness 50, L1 dilation k=55),
with three variants timed SAME-PROCESS (CLAUDE.md measurement rules —
difference quotient inside one jitted fori_loop, float-fetch sync):

  patch   — the 7x7x64px patch-grid step (what --prob 1 trains)
  sp      — whole-image 256px step + ON-DEVICE SLIC inside the loop body
            (the deployed path: --sp-backend device), no dilation
  sp_dil  — + --dilate-superpixels L1 k=55 (the full train.sh config)

Writes BENCH_SP.json at the repo root and prints one JSON line per variant
plus the ratio summary. History: round 1 measured patch 117 / sp 225 /
sp_dil 82; round 2's dilation kernel took sp_dil to 178 (sp 214.7); this
tool is the round-5 re-measurement with the current machine (layer4 rconv
gating, BN-stats fusion, profiler-era fixes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Config of record (/root/reference/code/train.sh:15-22)
BATCH = 6
CLIP_LEN = 4
N_PATCHES = 49
PATCH = 64
IMG = 256
NUM_SP = 36
COMPACTNESS = 50.0
DIL_K = 55
TEMP = 0.05
EDGEDROP = 0.1


def build(variant: str):
    import jax
    import jax.numpy as jnp

    from videowalk_tpu.models import CRW, CRWConfig
    from videowalk_tpu.parallel import create_train_state, make_optimizer

    cfg = dict(model_type="scratch", temperature=TEMP,
               edgedrop_rate=EDGEDROP, dtype=jnp.bfloat16)
    if variant != "patch":
        cfg.update(max_sp_num=48,
                   dilate_superpixels=(variant == "sp_dil"),
                   dilation_kernel_shape="L1",
                   dilation_kernel_size=DIL_K)
    model = CRW(CRWConfig(**cfg))
    optimizer = make_optimizer(lr=3e-4)
    rng = np.random.RandomState(0)

    if variant == "patch":
        batch = jnp.asarray(
            rng.randn(BATCH, CLIP_LEN, N_PATCHES, PATCH, PATCH, 3)
            .astype(np.float32))
        state = create_train_state(model, optimizer, batch[:1],
                                   jax.random.PRNGKey(0))
        aux = None
    else:
        batch = jnp.asarray(
            rng.randn(BATCH, CLIP_LEN, IMG, IMG, 3).astype(np.float32))
        # unnormalized view for SLIC ([0,1] floats, the --sp-backend device
        # input); kept device-resident like the prefetcher does
        aux = jnp.asarray(
            rng.rand(BATCH, CLIP_LEN, IMG, IMG, 3).astype(np.float32))
        from videowalk_tpu.ops import slic

        mask0 = slic(aux[:1], NUM_SP, COMPACTNESS)
        state = create_train_state(model, optimizer, batch[:1],
                                   jax.random.PRNGKey(0), sp_mask=mask0)
    return model, optimizer, state, batch, aux


def one_step_fn(model, optimizer, variant):
    import jax
    import jax.numpy as jnp
    import optax

    from videowalk_tpu.ops import slic

    def one_step(state, batch, aux, key):
        sp_mask = None
        if variant != "patch":
            # on-device SLIC is part of the deployed superpixel step
            # (cli/train.py device_slic_fn) — counted inside the loop
            sp_mask = slic(aux, NUM_SP, COMPACTNESS)

        def loss_fn(params, batch_stats):
            variables = {"params": params, "batch_stats": batch_stats}
            kwargs = {"sp_mask": sp_mask} if sp_mask is not None else {}
            (q, loss, diags), upd = model.apply(
                variables, batch, train=True, rngs={"dropout": key},
                mutable=["batch_stats"], **kwargs)
            return loss, upd.get("batch_stats", batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, batch_stats=new_stats,
                             opt_state=opt_state, step=state.step + 1), loss

    return one_step


def time_variant(variant: str, k1: int, k2: int, rounds: int):
    import jax
    import jax.numpy as jnp

    model, optimizer, state, batch, aux = build(variant)
    one_step = one_step_fn(model, optimizer, variant)

    @partial(jax.jit, static_argnums=(4,))
    def run_k(state, batch, aux, key, k):
        def body(i, carry):
            st, _ = carry
            st, loss = one_step(st, batch, aux,
                                jax.random.fold_in(key, i))
            return st, loss

        return jax.lax.fori_loop(0, k, body, (state, jnp.float32(0)))

    key = jax.random.PRNGKey(1)

    def timed(k):
        t0 = time.perf_counter()
        st, loss = run_k(state, batch, aux, key, k)
        _ = float(loss)  # real device fetch (block_until_ready is a tunnel no-op)
        return time.perf_counter() - t0, float(loss)

    timed(k1)
    timed(k2)
    ms = []
    for _ in range(rounds):
        t1, _ = timed(k1)
        t2, loss2 = timed(k2)
        assert np.isfinite(loss2), f"{variant}: non-finite loss {loss2}"
        ms.append((t2 - t1) / (k2 - k1) * 1e3)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=12)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SP.json"))
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/videowalk_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    print("# devices:", jax.devices(), flush=True)

    results = {}
    for variant in ("patch", "sp", "sp_dil"):
        ms = time_variant(variant, args.k1, args.k2, args.rounds)
        mean = float(np.mean(ms))
        results[variant] = {
            "step_ms": [round(m, 2) for m in ms],
            "mean_ms": round(mean, 2),
            "clips_per_s_per_chip": round(BATCH / (mean / 1e3), 1),
        }
        print(json.dumps({"variant": variant, **results[variant]}),
              flush=True)

    sp_speedup = results["patch"]["mean_ms"] / results["sp"]["mean_ms"]
    dil_speedup = results["patch"]["mean_ms"] / results["sp_dil"]["mean_ms"]
    out = {
        "config": "reference train.sh config of record: batch 6, clip_len 4"
                  ", temp 0.05, dropout 0.1; sp = on-device SLIC "
                  f"num_sp={NUM_SP} compactness={int(COMPACTNESS)} inside "
                  "the timed loop; sp_dil adds L1 dilation "
                  f"k={DIL_K}",
        "reference_claim": ">30% faster reduced-primitive training "
                           "(/root/reference/README.md:12,30)",
        "variants": results,
        "sp_over_patch": round(sp_speedup, 2),
        "sp_dil_over_patch": round(dil_speedup, 2),
        "device": str(jax.devices()[0]),
        "history": {"r1": {"patch": 117, "sp": 225, "sp_dil": 82},
                    "r2": {"sp": 214.7, "sp_dil": 178.0},
                    "r5_pre_allow32": {"patch": 131.9, "sp": 234.6,
                                       "sp_dil": 182.1}},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"sp_over_patch": out["sp_over_patch"],
                      "sp_dil_over_patch": out["sp_dil_over_patch"],
                      "artifact": args.out}))


if __name__ == "__main__":
    main()
