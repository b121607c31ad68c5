import contextlib
import os

# tri-state override for the fused Pallas inference kernels:
# None = default (off — opt in explicitly), True/False = forced
_FUSED_OVERRIDE = None


def fused_kernels_enabled() -> bool:
    """Whether inference modules should take their fused Pallas paths.

    Default OFF: the XLA path is the portable numerical reference, and the
    fused kernels' Mosaic compile is expensive on cold caches (~minutes per
    shape on remote-compile backends), so production entry points opt in
    deliberately. Enable with set_fused_kernels(True) or LEADYOLO_FUSED=1.
    Export paths force-disable them — jax2tf cannot serialize pallas_call,
    and exported artifacts must stay portable.
    """
    if _FUSED_OVERRIDE is not None:
        return _FUSED_OVERRIDE
    env = os.environ.get("LEADYOLO_FUSED")
    if env is not None:
        return env not in ("0", "false", "off")
    return False


def set_fused_kernels(value):
    """Force fused kernels on/off (None restores auto)."""
    global _FUSED_OVERRIDE
    _FUSED_OVERRIDE = value


@contextlib.contextmanager
def disable_fused_kernels():
    """Scoped opt-out (export / numerical-reference paths)."""
    global _FUSED_OVERRIDE
    prev = _FUSED_OVERRIDE
    _FUSED_OVERRIDE = False
    try:
        yield
    finally:
        _FUSED_OVERRIDE = prev


def default_cache_dir() -> str:
    """Repo-local XLA cache dir. Round-3 postmortem: the cache lived in
    /tmp, which did not survive into the driver environment — the gate paid
    a 1016 s cold compile (BENCH_r03.json). A dir inside the repo persists
    with the checkout. Override with LEADYOLO_JAX_CACHE."""
    env = os.environ.get("LEADYOLO_JAX_CACHE")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo, ".jax_cache")


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache — first compile of the big train/eval
    graphs is slow (remote compile); later runs hit the cache."""
    import jax

    path = path or default_cache_dir()
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
