"""Persistent XLA compilation cache.

The reference pays its compile cost once, at nvcc build time (Makefile:1-5);
our analogue of that ahead-of-time build is the XLA persistent compilation
cache: the first process compiles each (program, shapes, backend) once and
every later process — bench reruns, CLI restarts, supervisor respawns after a
crash (utils/supervisor.py) — deserializes the executable instead of paying
the 13-65 s trace+compile again.  Entry points opt in via
``enable_compilation_cache()``; the library never flips global config behind
an importer's back.
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "ppoc_tpu", "xla_cache"
)


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache rooted at ``path``.

    Defaults to ``~/.cache/ppoc_tpu/xla_cache`` (override with the
    ``PPOC_CACHE_DIR`` env var; set it to ``0``/``off`` to disable).
    Safe to call more than once.  Returns the cache dir, or None when
    disabled or unsupported by this jax build.
    """
    import jax

    env = os.environ.get("PPOC_CACHE_DIR")
    if env is not None and env.lower() in ("0", "off", "none", ""):
        return None
    path = path or env or DEFAULT_DIR
    # partition by platform WITHOUT initializing a backend (this runs
    # before jax.distributed in the CLI): XLA:CPU AOT entries bake host
    # machine features into the executable but not the cache key, so a
    # TPU-session entry loaded by a CPU child (or vice versa) warns about
    # SIGILL-capable feature mismatches.  The jax config value wins over
    # the env vars — the repo's mandated CPU pin is the config API, which
    # leaves the ambient JAX_PLATFORMS=axon in place
    try:
        import jax

        plat = jax.config.jax_platforms  # set via config API; None default
    except Exception:
        plat = None
    plat = (plat or os.environ.get("PPOC_PLATFORM")
            or os.environ.get("JAX_PLATFORMS") or "default")
    plat = plat.split(",")[0] or "default"
    if plat == "cpu":
        # XLA:CPU AOT entries bake compile-TIME preference flags
        # (prefer-no-scatter/gather) into the executable but not the cache
        # key; a reader whose flags differ gets machine-feature-mismatch
        # refusals and pathological slowdowns (hardware-observed: a CPU
        # child re-reading its own partition stalled a 1 s epoch past
        # 120 s).  CPU compiles are seconds — the cache exists for the
        # chip's — so off-TPU runs go uncached.
        return None
    path = os.path.join(path, plat)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every real compile: the default 1 s floor would skip the
        # small eval/checkpoint programs whose compiles still add up
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # unsupported jax build or unwritable dir: run uncached
        return None
    return path
