"""Process-level runtime setup shared by the CLIs / bench / graft entries.

Enables the persistent XLA compilation cache: on the target runtime a cold
ResNet-scale compile costs 40-300 s (remote compile service), so caching
compiled executables across processes removes the dominant startup cost for
every stage after the first run.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = os.path.expanduser("~/.cache/h36x_jax")
_done = False


def setup_jax_cache(cache_dir: str | None = None) -> None:
    """Idempotent; call before the first jit compile. Honors
    H36X_JAX_CACHE_DIR (set empty to disable)."""
    global _done
    if _done:
        return
    _done = True
    env = os.environ.get("H36X_JAX_CACHE_DIR")
    if cache_dir is None and env == "":
        return  # env kill-switch (explicit cache_dir still wins)
    path = cache_dir or env or _DEFAULT_CACHE
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
