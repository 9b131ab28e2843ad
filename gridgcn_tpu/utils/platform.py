"""Backend-platform selection helper.

Some PJRT plugins (e.g. tunneled TPU backends) ignore the `JAX_PLATFORMS`
environment variable; applying it through `jax.config` before the backend
initializes is the only reliable way to honor it (tests/conftest.py uses the
same pattern). Every CLI entry point calls this so `JAX_PLATFORMS=cpu
<cli> ...` behaves identically whether invoked as `python -m`, a console
script, or a file path.
"""

from __future__ import annotations

import os


def force_platform_from_env() -> None:
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass  # backend already initialized — nothing safe to do
