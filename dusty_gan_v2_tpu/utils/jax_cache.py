"""Persistent XLA compilation cache: full-size training programs take minutes to
compile (remote TPU compile service); caching them makes restarts/resumes instant,
and with threshold 0 even tiny eager ops (each a ~1 s remote round-trip) are cached —
warm process startup drops from ~3 min to ~15 s.

Only enabled for accelerator backends, AND no code in this repo may run jit
computations on explicit CPU devices while the cache is active: XLA:CPU AOT
artifacts bake in the *compiling* machine's features — under the axon tunnel the
remote helper's CPU differs from this host, so cached CPU blobs can SIGILL on
reload. (TPU executables are target-specific bytecode; safe to cache.)
"""

import os


def enable_persistent_cache():
    import jax

    try:
        if jax.default_backend() == "cpu":
            return
    except Exception:
        return
    d = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # Cache EVERYTHING: under the axon remote-compile service even a trivial
        # eager op (sin/transpose/...) costs ~0.5-1 s of round-trip compile, and the
        # default 1 s threshold keeps them uncached — dozens of such ops made every
        # process start pay ~2 min. Tiny entries are a few KB.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
