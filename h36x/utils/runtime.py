"""Process-level runtime setup shared by the CLIs / bench / graft entries.

Enables the persistent XLA compilation cache: on the target runtime a cold
ResNet-scale compile costs 40-300 s (remote compile service), so caching
compiled executables across processes removes the dominant startup cost for
every stage after the first run.
"""

from __future__ import annotations

import os

_done = False


def _machine_scoped_default() -> str:
    """Per-machine cache directory.

    The persistent cache stores AOT-compiled XLA:CPU executables that embed
    host ISA features; loading one compiled on a different machine can
    SIGILL ("Machine type used for XLA:CPU compilation doesn't match the
    machine on which the code will run"). Scoping the directory by platform
    + CPU model + jax version means a cache warmed on another host (shared
    $HOME, container image reuse) is simply not found rather than loaded.
    """
    import hashlib
    import platform

    cpu = platform.processor() or platform.machine()
    try:  # the model name catches ISA differences `machine()` misses
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    cpu = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    try:
        import jax

        ver = jax.__version__
    except Exception:
        ver = "unknown"
    key = hashlib.sha1(
        f"{platform.system()}-{platform.machine()}-{cpu}-{ver}".encode()
    ).hexdigest()[:12]
    return os.path.expanduser(f"~/.cache/h36x_jax/{key}")


def _forced_cpu_platform() -> bool:
    """True when this process is pinned to the XLA:CPU backend (tests,
    `dryrun_multichip`'s virtual-device mesh). CPU compiles are fast, and
    XLA:CPU AOT cache loads warn "machine type doesn't match" even on the
    SAME machine (the compile embeds LLVM tuning features like
    prefer-no-gather that the loader's host probe never reports) — so the
    persistent cache buys nothing on CPU and pollutes the driver's dryrun
    tail with SIGILL-risk warnings.

    Note: XLA_FLAGS=--xla_force_host_platform_device_count only sizes the
    CPU platform, it does NOT win backend selection (a real TPU plugin
    still takes over) — so it is deliberately not treated as a CPU pin
    here, or a TPU process with that flag exported in the shell would
    silently lose the cache. Callers that force CPU *after* import
    (dryrun_multichip) must call disable_jax_cache() themselves."""
    # both the current (JAX_PLATFORMS/jax_platforms) and the legacy
    # (JAX_PLATFORM_NAME/jax_platform_name) pins are honored by jax; a
    # process forced to CPU through either must skip the persistent cache
    for var in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME"):
        if os.environ.get(var, "").strip().lower() == "cpu":
            return True
    try:
        import jax

        if str(jax.config.jax_platforms).strip().lower() == "cpu":
            return True
        return (str(getattr(jax.config, "jax_platform_name", "") or "")
                .strip().lower() == "cpu")
    except Exception:
        return False


def disable_jax_cache() -> None:
    """Turn the persistent cache OFF for this process, even if
    setup_jax_cache already enabled it. For callers that repoint jax at
    the CPU backend after import (dryrun_multichip): the import-time gate
    in setup_jax_cache cannot see a platform switch that happens later."""
    global _done
    _done = True  # later setup_jax_cache() calls stay no-ops
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        pass


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
    if cache_dir is None and not env and _forced_cpu_platform():
        return  # TPU-only optimization; see _forced_cpu_platform
    path = cache_dir or env or _machine_scoped_default()
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
