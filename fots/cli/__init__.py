"""CLI entry points.

Importing this package makes the ``JAX_PLATFORMS`` environment variable
authoritative: some containers register an accelerator platform from
``sitecustomize`` and force ``jax_platforms`` before user code runs, in
which case the env var alone is silently ignored and every CLI compile
goes to the remote accelerator.  Re-applying the env var here restores the
documented jax behavior (``JAX_PLATFORMS=cpu python -m fots.cli.detect``
really runs on CPU).
"""

import os


def _apply_platform_env():
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


def _enable_compile_cache():
    """Persistent XLA compile cache for every CLI.

    The heavy programs (train step, serving forward per strip bucket) cost
    60-120 s each to compile against a remote accelerator; caching them on
    disk makes the second CLI invocation start in seconds.  Opt out with
    FOTS_COMPILE_CACHE=0 or point FOTS_COMPILE_CACHE at a directory.

    Never enabled for CPU runs: jax 0.9's XLA:CPU AOT reload fails its own
    machine-feature check (+prefer-no-scatter pseudo-features recorded as
    required host features) and can SIGILL on the second invocation."""
    cache = os.environ.get("FOTS_COMPILE_CACHE", "~/.cache/fots_xla")
    if cache == "0":
        return
    # first entry = the platform jax will actually select ("axon,cpu" is
    # the container default: TPU with CPU fallback — cache stays on)
    primary = os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip().lower()
    if primary == "cpu":
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_apply_platform_env()
_enable_compile_cache()
