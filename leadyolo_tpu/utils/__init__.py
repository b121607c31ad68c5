import os


def enable_compilation_cache(path: str = "/tmp/leadyolo_jax_cache"):
    """Persistent XLA compilation cache — first compile of the big train/eval
    graphs is slow (remote compile); later runs hit the cache."""
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
