"""Backend-selection hygiene for the CLI drivers.

In images where a TPU PJRT plugin is injected via ``PYTHONPATH`` (e.g. the
axon tunnel used for development), the plugin can register itself in a way
that shadows the standard ``JAX_PLATFORMS`` environment variable — a user
(or a subprocess test) exporting ``JAX_PLATFORMS=cpu`` still gets the TPU
backend. The config API is authoritative, so the drivers re-assert the env
var through it before first backend use.
"""

from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    """Make ``JAX_PLATFORMS`` authoritative over injected PJRT plugins.

    Call before the first ``jax.devices()`` / first jit dispatch. No-op when
    the variable is unset or the backend is already initialized.
    """
    plats = os.environ.get("JAX_PLATFORMS", "").strip()
    if not plats:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plats)
    except Exception:
        pass  # backend already initialized; too late to change


def enable_persistent_compile_cache() -> None:
    """Point JAX at an on-disk compilation cache (opt-out).

    TPU compiles through a remote compile service cost minutes; every
    repeat invocation of the drivers (sweep combos, resumed runs, the
    bench) retraces the same graphs. ``VIDEOWALK_COMPILE_CACHE`` overrides
    the location; set it to ``off``/``0`` to disable. Only compilations
    slower than 5 s are persisted, so tiny CPU test graphs don't churn the
    directory.
    """
    loc = os.environ.get("VIDEOWALK_COMPILE_CACHE", "").strip()
    if loc.lower() in ("off", "0", "none"):
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          loc or "/tmp/videowalk_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the knob: run uncached
