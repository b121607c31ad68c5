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


# train-mode masked-dense grouped-conv gradients (nn/rfa.py generate conv).
# Default OFF: the isolated-op probe predicted a win (BWD_PROBE_r05: grouped
# bwd 6.4x fwd vs dense 2.1x) but the same-process full-step A/B measured
# dense 14 ms SLOWER (DENSE_GRAD_AB_r05.json: 124.7 vs 110.7 ms/step) — the
# whole backward already runs at ~100% of the HBM roofline and the dense
# form's extra FLOPs don't hide there. Kept behind the flag as the record
# of the investigated path (LEADYOLO_DENSE_GRAD=1 / set_dense_grad(True)).
_DENSE_GRAD_OVERRIDE = None


def dense_grad_enabled() -> bool:
    if _DENSE_GRAD_OVERRIDE is not None:
        return _DENSE_GRAD_OVERRIDE
    env = os.environ.get("LEADYOLO_DENSE_GRAD")
    if env is not None:
        return env not in ("0", "false", "off")
    return False


def set_dense_grad(value):
    """Force the masked-dense train conv on/off (None restores auto)."""
    global _DENSE_GRAD_OVERRIDE
    _DENSE_GRAD_OVERRIDE = value


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
