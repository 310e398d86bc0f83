"""Persistent XLA compilation cache: full-size training programs take minutes to
compile; caching them makes restarts/resumes instant."""

import os


def enable_persistent_cache():
    import jax

    d = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
