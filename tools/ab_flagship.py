"""Same-process A/B harness for the flagship train step.

Every dispatch/gating change must be A/B'd on the FULL step in ONE process
before adoption (CLAUDE.md measurement discipline; round 3: a 0.3 ms
isolated per-conv win cost 7 ms in-context, and cross-process variance is
±15%, so only same-process comparisons are meaningful). This harness makes
that one command:

    python tools/ab_flagship.py \
        --variant base \
        --variant rconv_off:VIDEOWALK_RCONV=off \
        --variant fuse_always:VIDEOWALK_REFLECT_FUSE=always

Each variant sets its env BEFORE its own trace (the perf switches are read
at trace time), builds a fresh jitted K-step loop, and is timed by the
difference quotient between a K1-step and a K2-step call — this cancels
the fixed dispatch+fetch cost of the dev tunnel and measures pure on-chip
step time. Sync is a real device->host ``float()`` fetch
(``jax.block_until_ready`` is a NO-OP through some remote-device tunnels).
Variants are interleaved over ``--rounds`` passes so slow drift (thermal,
tunnel load) hits every variant equally; the summary reports per-variant
min/mean.

Emits one JSON line per measurement and a ranked summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

# runnable as `python tools/ab_flagship.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_SHARED = {}   # one device-resident (state, batch, optimizer) per shape —
               # per-variant copies OOM the chip at batch 32 (5 variants x
               # 616 MB batch + state alongside a 13 GiB-temp executable)


def _shared_state_and_batch(batch_size, clip_len, n_patches, patch):
    import jax
    import jax.numpy as jnp

    from videowalk_tpu.models import CRW, CRWConfig
    from videowalk_tpu.parallel import create_train_state, make_optimizer

    key = (batch_size, clip_len, n_patches, patch)
    if key not in _SHARED:
        # state structure is identical across variants (remat is pure graph
        # surgery — tests/test_models_extra.py pins loss AND grads equal)
        model = CRW(CRWConfig(model_type="scratch", temperature=0.05,
                              edgedrop_rate=0.1, dtype=jnp.bfloat16))
        optimizer = make_optimizer(lr=3e-4)
        rng = np.random.RandomState(0)
        batch = jnp.asarray(
            rng.randn(batch_size, clip_len, n_patches, patch, patch, 3)
            .astype(np.float32))
        state = create_train_state(model, optimizer, batch[:1],
                                   jax.random.PRNGKey(0))
        _SHARED[key] = (state, batch, optimizer)
    return _SHARED[key]


def build_step(batch_size: int, clip_len: int, n_patches: int, patch: int,
               remat: bool, report_memory: bool = False):
    """Fresh model + jitted K-step loop (new trace, current env).

    The loop body is the PRODUCTION step (parallel/train_step.
    make_train_step — the same function the train CLI and dryrun run),
    not a re-implementation: a gating change whose cost interacts with
    the diags/metrics in the real graph must be measured against the
    real graph."""
    import jax
    import jax.numpy as jnp

    from videowalk_tpu.models import CRW, CRWConfig
    from videowalk_tpu.parallel import make_train_step

    model = CRW(CRWConfig(model_type="scratch", temperature=0.05,
                          edgedrop_rate=0.1, dtype=jnp.bfloat16,
                          remat=remat))
    state, batch, optimizer = _shared_state_and_batch(
        batch_size, clip_len, n_patches, patch)
    # donate=False: the step is called inside the outer jit's fori_loop
    # (donation is meaningless mid-trace) and again as the carry seed
    one_step = make_train_step(model, optimizer, donate=False)

    @partial(jax.jit, static_argnums=(3,))
    def run_k(state, batch, key, k):
        def body(i, carry):
            st, _ = carry
            st, metrics = one_step(st, batch, jax.random.fold_in(key, i))
            return st, metrics["loss"]

        return jax.lax.fori_loop(0, k, body, (state, jnp.float32(0)))

    key = jax.random.PRNGKey(1)

    mem = None
    if report_memory:
        # Compiler buffer-allocation peak for ONE step — deterministic,
        # unlike device memory_stats()['peak_bytes_in_use'] which is
        # cumulative across every variant traced in this process.
        try:
            ma = run_k.lower(state, batch, key, 1).compile().memory_analysis()
            mem = {"temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
                   "args_gib": round(ma.argument_size_in_bytes / 2**30, 3),
                   "output_gib": round(ma.output_size_in_bytes / 2**30, 3)}
        except Exception as e:  # tunnel backends may not expose it
            mem = {"error": repr(e)}

    def timed(k):
        t0 = time.perf_counter()
        _, loss = run_k(state, batch, key, k)
        loss = float(loss)  # force the device->host fetch (real sync)
        assert np.isfinite(loss), f"non-finite loss {loss}"
        return time.perf_counter() - t0

    return timed, mem


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--variant", action="append", required=True,
                   help="NAME[:ENV=V[,ENV=V...]] — env applied before this "
                        "variant's trace; unlisted vars are RESTORED to the "
                        "process's startup value between variants")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--clip-len", type=int, default=8)
    p.add_argument("--n-patches", type=int, default=49)
    p.add_argument("--patch", type=int, default=64)
    p.add_argument("--remat", action="store_true",
                   help="default remat setting; a variant overrides it with "
                        "the pseudo-env token @remat=0/1")
    p.add_argument("--report-memory", action="store_true",
                   help="print the compiled one-step memory_analysis "
                        "(temp/args/output GiB) per variant")
    p.add_argument("--k1", type=int, default=2)
    p.add_argument("--k2", type=int, default=12)
    p.add_argument("--rounds", type=int, default=3,
                   help="interleaved measurement passes per variant")
    args = p.parse_args(argv)

    variants = []
    touched = set()
    for spec in args.variant:
        name, _, envs = spec.partition(":")
        env = {}
        remat = args.remat
        if envs:
            last = None
            for kv in envs.split(","):
                if "=" not in kv and last is not None:
                    # comma-valued env (e.g. REMAT_STAGES=layer1,layer2):
                    # a segment without '=' continues the previous value
                    env[last] += "," + kv.strip()
                    continue
                k, _, v = kv.partition("=")
                k, v = k.strip(), v.strip()
                if k == "@remat":   # harness option, not an env var
                    remat = v not in ("", "0")
                    continue
                env[k] = v
                touched.add(k)
                last = k
        variants.append((name, env, remat))
    base_env = {k: os.environ.get(k) for k in touched}

    def apply_env(env):
        for k, v in base_env.items():   # restore, then overlay
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        os.environ.update(env)

    # the JAX_PLATFORMS env var alone is shadowed by injected TPU PJRT
    # plugins on some images; re-assert it through the config API like the
    # CLI drivers do (utils/platform.py), BEFORE the backend initializes
    from videowalk_tpu.utils.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    import jax

    try:   # tunnel compiles cost minutes; reuse across repeat runs
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/videowalk_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    print(f"# devices: {jax.devices()}", flush=True)

    timers = {}
    failed = {}
    for name, env, remat in variants:
        apply_env(env)
        try:
            timers[name], mem = build_step(
                args.batch, args.clip_len, args.n_patches, args.patch, remat,
                report_memory=args.report_memory)
            if mem is not None:
                print(json.dumps({"variant": name, "memory_analysis": mem}),
                      flush=True)
            timers[name](args.k1)   # compile both trip counts
            timers[name](args.k2)
        except Exception as e:
            # a variant that cannot compile/run (e.g. remat-off OOM at
            # batch 32) is itself a measurement — record it, keep the rest
            timers.pop(name, None)
            failed[name] = repr(e)[:500]
            print(json.dumps({"variant": name, "failed": failed[name]}),
                  flush=True)
    variants = [v for v in variants if v[0] in timers]
    if not variants:
        raise SystemExit("every variant failed: " + json.dumps(failed))

    steps = {name: [] for name, _, _ in variants}
    for r in range(args.rounds):
        for name, env, _ in variants:
            apply_env(env)      # harmless post-trace; keeps logs truthful
            t1 = timers[name](args.k1)
            t2 = timers[name](args.k2)
            step_ms = (t2 - t1) / (args.k2 - args.k1) * 1e3
            steps[name].append(step_ms)
            print(json.dumps({"variant": name, "round": r,
                              "step_ms": round(step_ms, 2)}), flush=True)

    print("\n== summary (full-step ms, lower is better) ==")
    for name, err in failed.items():
        print(json.dumps({"variant": name, "failed": err}))
    ranked = sorted(steps.items(), key=lambda kv: min(kv[1]))
    for name, ms in ranked:
        clips = args.batch / (min(ms) / 1e3)
        print(json.dumps({
            "variant": name, "min_ms": round(min(ms), 2),
            "mean_ms": round(float(np.mean(ms)), 2),
            "clips_per_s": round(clips, 1)}))
    best = ranked[0]
    print(f"# best: {best[0]} ({min(best[1]):.1f} ms); adopt only if the "
          f"win holds across rounds — see CLAUDE.md measurement rules")


if __name__ == "__main__":
    main()
