"""Isolated A/B: layer1 16x16x64 3x3 conv fwd+bwd, plain vs pair-packed.

Measures the VIDEOWALK_L1PACK hypothesis (ops/reflect_conv.py::_plain_conv):
packing image pairs along channels with a block-diagonal kernel fills the
MXU (K=N=128) at 2x nominal FLOPs. Difference-quotient timing inside one
jitted fori_loop, float-fetch synced (house rules, CLAUDE.md).

    python tools/microbench_l1pack.py [--batch 3136] [--hw 18]

--hw 18 = the padded VALID input the reflect path actually feeds (flagship
64px patches: 16x16 interior + materialized reflect pad).
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=3136)
    ap.add_argument("--hw", type=int, default=18)
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/videowalk_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    B, H = args.batch, args.hw
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, 64).astype(np.float32),
                    dtype=jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05,
                    dtype=jnp.bfloat16)

    def conv_plain(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from videowalk_tpu.ops.reflect_conv import pair_packed_conv

    def conv_packed(x, w):
        return pair_packed_conv(x, w, [(0, 0), (0, 0)])

    def make_runner(conv):
        def loss(x, w, s):
            y = conv(x * s.astype(x.dtype), w)  # s threads iteration dependence
            return jnp.sum(y.astype(jnp.float32) ** 2)

        @partial(jax.jit, static_argnums=(2,))
        def run_k(x, w, k):
            def body(i, carry):
                s, acc = carry
                l, (dx, dw) = jax.value_and_grad(loss, argnums=(0, 1))(
                    x, w, s)
                # fold the grads back into the carry so nothing is DCE'd
                return (s + 1e-12 * l.astype(jnp.float32)
                        + 1e-12 * jnp.sum(dw.astype(jnp.float32)),
                        acc + 1e-12 * jnp.sum(dx.astype(jnp.float32)))
            return jax.lax.fori_loop(0, k, body,
                                     (jnp.float32(1.0), jnp.float32(0.0)))
        return run_k

    # parity first (fwd)
    yp_ = conv_packed(x[:64], w)
    yn_ = conv_plain(x[:64], w)
    err = float(jnp.max(jnp.abs(yp_.astype(jnp.float32)
                                - yn_.astype(jnp.float32))))
    print("fwd max abs diff (bf16):", err)

    for name, conv in [("plain", conv_plain), ("packed", conv_packed)]:
        run_k = make_runner(conv)

        def timed(k):
            t0 = time.perf_counter()
            s, acc = run_k(x, w, k)
            _ = float(s) + float(acc)
            return time.perf_counter() - t0

        timed(args.k1); timed(args.k2)
        t1 = timed(args.k1); t2 = timed(args.k2)
        ms = (t2 - t1) / (args.k2 - args.k1) * 1e3
        print(f"{name}: {ms:.3f} ms per fwd+bwd conv "
              f"(B={B}, {H}x{H}x64 VALID)")


if __name__ == "__main__":
    main()
