"""True 2-process distributed training test (Gloo CPU collectives).

Validates what the virtual 8-device mesh cannot: `jax.distributed.initialize`
rendezvous (utils.maybe_initialize_distributed), per-host batch assembly via
`make_array_from_process_local_data`, the collective log-step artifact path
(host_array allgathers of sharded previews and TP-sharded params), primary-only
file writes, and that both processes end with bit-identical parameters.
Replaces the reference's never-tested Horovod layer (main.py:528-531, 626-629).
"""

import os

import pytest

from feed_forward_vqgan_clip_tpu.parallel.multiproc import run_two_process_dryrun


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    folder = run_two_process_dryrun(tmp=str(tmp_path))
    # primary-only writes: checkpoint + previews + sidecars exist exactly once
    assert os.path.exists(os.path.join(folder, "checkpoint", "params.msgpack"))
    assert os.path.exists(os.path.join(folder, "fixed_batch_progress.png"))
    # both workers dumped identical params (asserted inside the runner)
    assert os.path.exists(os.path.join(folder, "params_0.pkl"))
    assert os.path.exists(os.path.join(folder, "params_1.pkl"))
