"""Small host-side utilities."""

import logging
import os

log = logging.getLogger(__name__)


def enable_compilation_cache(path: str = None) -> None:
    """Turn on JAX's persistent compilation cache.

    Through the axon remote-compile tunnel a cold compile of the full pipeline
    costs minutes; the persistent cache turns repeat runs into seconds (measured
    385s -> 2.8s across processes). Safe to call multiple times; respects an
    existing jax_compilation_cache_dir.
    """
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    path = path or os.environ.get(
        "FFVC_JAX_CACHE", os.path.expanduser("~/.cache/ffvc_jax_cache")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:  # pragma: no cover
        log.warning("could not enable compilation cache: %s", e)
