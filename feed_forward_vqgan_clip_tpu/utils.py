"""Small host-side utilities."""

import logging
import os

log = logging.getLogger(__name__)

_distributed_initialized = False


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up: call `jax.distributed.initialize` when a
    multi-process environment is declared, before any other JAX use.

    Replaces the reference's `hvd.init()` (/root/reference/main.py:528-531,
    1339-1341): where Horovod processes discover each other through mpirun,
    JAX processes rendezvous at a coordinator. Triggers, in order:

      * FFVC_COORDINATOR_ADDRESS + FFVC_NUM_PROCESSES + FFVC_PROCESS_ID —
        explicit (used by the 2-process tests and any hand-rolled launcher);
      * JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS with NUM_PROCESSES and
        PROCESS_ID — conventional JAX cluster env;
      * TPU-pod / Megascale env (TPU_WORKER_HOSTNAMES, MEGASCALE_COORDINATOR_
        ADDRESS) — bare `initialize()`, which auto-detects on Cloud TPU.

    Single-process runs (none of the env present) are a no-op so every CLI
    entry point can call this unconditionally. Idempotent. Returns True when
    running multi-process.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    env = os.environ
    coord = env.get("FFVC_COORDINATOR_ADDRESS") or env.get(
        "JAX_COORDINATOR_ADDRESS"
    ) or env.get("COORDINATOR_ADDRESS")
    nproc = env.get("FFVC_NUM_PROCESSES") or env.get("NUM_PROCESSES")
    pid = env.get("FFVC_PROCESS_ID") or env.get("PROCESS_ID")

    import jax

    # TPU_WORKER_HOSTNAMES with a single host (e.g. the axon plugin sets
    # 'localhost') is NOT a pod — require a multi-host list.
    hostnames = env.get("TPU_WORKER_HOSTNAMES", "")
    multihost_pod = "," in hostnames or env.get("MEGASCALE_COORDINATOR_ADDRESS")
    try:
        if coord and nproc is not None and pid is not None:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(pid),
            )
        elif coord or multihost_pod:
            # pod/cluster auto-detection fills in the rest
            jax.distributed.initialize()
        else:
            return False
    except RuntimeError as e:  # already initialized by the embedder
        if "already initialized" not in str(e).lower():
            raise
    except ValueError as e:
        # auto-detection found no usable cluster spec — stay single-process
        log.warning("jax.distributed auto-init skipped: %s", e)
        return False
    _distributed_initialized = True
    log.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        len(jax.local_devices()), len(jax.devices()),
    )
    return True


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
