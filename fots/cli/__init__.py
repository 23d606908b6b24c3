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


_apply_platform_env()
