"""True multi-process validation of the distributed path on CPU.

Spawns N=2 real OS processes that rendezvous through
`jax.distributed.initialize` (Gloo collectives on CPU), each contributing 2
virtual devices, and runs the FULL trainer on a (data=2, model=2) global mesh —
so per-host batch assembly (`make_array_from_process_local_data`), the
collective log-step artifact path (host_array allgathers of sharded
renders/params), TP-sharded checkpointing, and final-save all execute exactly
as they would on a TPU pod. The reference validated its Horovod layer only by
running cluster jobs (SURVEY.md §4); this is the in-repo equivalent.

Used by tests/test_multiprocess.py and by __graft_entry__.dryrun_multichip when
FFVC_DRYRUN_PROCESSES=2.
"""

import os
import pickle
import socket
import subprocess
import sys
import tempfile

import numpy as np

_WORKER_MODULE = "feed_forward_vqgan_clip_tpu.parallel.multiproc"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_two_process_dryrun(tmp: str = None, timeout: int = 900) -> str:
    """Launch 2 worker processes, wait, and assert both saw identical params.

    Returns the shared run folder (contains checkpoint/, progress.png, and one
    params_<pid>.pkl per process)."""
    tmp = tmp or tempfile.mkdtemp(prefix="ffvc_mp_")
    rng = np.random.default_rng(0)
    np.savez(
        os.path.join(tmp, "feats.npz"),
        x=rng.normal(size=(8, 32)).astype(np.float32),
        y=rng.normal(size=(8, 32)).astype(np.float32),
    )
    # in-train eval set: _run_eval's host-array path must be collective-safe
    # (every process executes eval_step on replicated host feats while the train
    # step uses explicit shardings — the asymmetry under test). Feature-file
    # input (not .txt prompts) so the real BPE table isn't required.
    np.savez(
        os.path.join(tmp, "eval_feats.npz"),
        x=rng.normal(size=(5, 32)).astype(np.float32),
        y=rng.normal(size=(5, 32)).astype(np.float32),
    )
    port = _free_port()
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            FFVC_COORDINATOR_ADDRESS=f"localhost:{port}",
            FFVC_NUM_PROCESSES="2",
            FFVC_PROCESS_ID=str(pid),
            FFVC_MP_TMP=tmp,
            PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", _WORKER_MODULE],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"worker {pid} failed (rc={p.returncode}):\n{out[-4000:]}"
            )
    assert any("Eval dists" in out for out in outputs), (
        "in-train eval did not run on the multi-process path"
    )
    with open(os.path.join(tmp, "params_0.pkl"), "rb") as fd:
        p0 = pickle.load(fd)
    with open(os.path.join(tmp, "params_1.pkl"), "rb") as fd:
        p1 = pickle.load(fd)
    import jax

    leaves0, tree0 = jax.tree.flatten(p0)
    leaves1, tree1 = jax.tree.flatten(p1)
    assert tree0 == tree1, "param tree structure diverged across processes"
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert os.path.exists(os.path.join(tmp, "checkpoint", "params.msgpack")), (
        "primary did not write the checkpoint"
    )
    assert os.path.exists(os.path.join(tmp, "progress.png")), (
        "primary did not write progress previews"
    )
    return tmp


def _worker() -> None:
    # Pin CPU before anything else touches JAX: the axon TPU plugin rewrites
    # JAX_PLATFORMS behind our back, and two processes must not race for the
    # single real chip.
    import jax

    jax.config.update("jax_platforms", "cpu")
    from feed_forward_vqgan_clip_tpu.utils import maybe_initialize_distributed

    assert maybe_initialize_distributed(), "worker env did not trigger initialize"
    assert jax.process_count() == 2, jax.process_count()

    import pickle as pkl

    from feed_forward_vqgan_clip_tpu.config import make_config
    from feed_forward_vqgan_clip_tpu.parallel import mesh as meshlib
    from feed_forward_vqgan_clip_tpu.train.loop import train

    tmp = os.environ["FFVC_MP_TMP"]
    cfg = make_config(
        clip_model="tiny",
        vqgan_arch=dict(
            n_embed=32, embed_dim=8, z_channels=8, ch=8, ch_mult=(1, 2),
            num_res_blocks=1, attn_resolutions=(4,), resolution=8,
        ),
        model_type="mlp_mixer", dim=16, depth=2, dropout=0, vq_image_size=4,
        batch_size=4, repeat=2, cutn=2, cut_size=32, pool_size=32,
        noise_dim=8, nb_noise=4, use_ema=True,
        lr=1e-3, epochs=100, max_steps=2, log_interval=1,
        folder=tmp, compute_dtype="float32", seed=0,
        path=os.path.join(tmp, "feats.npz"),
        eval_path=os.path.join(tmp, "eval_feats.npz"),
        eval_clip_model="tiny",
        mesh_shape={"data": 2, "model": 2},
    )
    state = train(cfg)
    assert int(state.step) >= 2
    params = meshlib.host_tree(state.params)
    with open(os.path.join(tmp, f"params_{jax.process_index()}.pkl"), "wb") as fd:
        pkl.dump(params, fd)
    print(f"worker {jax.process_index()} OK", flush=True)


if __name__ == "__main__":
    _worker()
