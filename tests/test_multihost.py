"""Multi-host data parallelism: 2 processes x 1 CPU device each must produce
EXACTLY the training result of one process with a 2-device mesh.

This is the SURVEY §2.7 TPU-native scaling story the reference lacks:
`jax.distributed` forms the global runtime, the mesh spans hosts, each host
feeds its shard of the global batch, and XLA's partitioner places the
gradient all-reduce."""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from fastvocoder_tpu.hparams import HP, MelGANConfig, ModelConfig, TINY_DISC
from fastvocoder_tpu.parallel import (
    compile_train_step_no_weight,
    make_mesh,
    replicate_state,
    shard_batch,
)
from fastvocoder_tpu.train.trainer import make_trainer

CHILD = os.path.join(os.path.dirname(__file__), "_multihost_child.py")
N_STEPS = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference(init_path: str) -> tuple:
    """The same program on a 2-device mesh in this process; saves the
    initial state for the children."""
    fixed = 10
    hp = HP.replace(fixed_length=fixed)
    cfg = ModelConfig(
        model_name="melgan",
        arch=MelGANConfig(channels=(8, 8, 8, 8, 8)),
        lambda_stft=1.0,
    )
    trainer = make_trainer(cfg, hp=hp, disc_cfg=TINY_DISC)
    mesh = make_mesh(jax.devices()[:2])
    state0 = trainer.init_state(jax.random.PRNGKey(0))
    leaves = jax.tree_util.tree_leaves(jax.device_get(state0))
    np.savez(init_path, **{f"l{i}": np.asarray(l) for i, l in enumerate(leaves)})
    state = replicate_state(state0, mesh)
    step = compile_train_step_no_weight(trainer.pre_adv_step, mesh)

    rng = np.random.default_rng(0)
    for _ in range(N_STEPS):
        gmel = rng.standard_normal((4, fixed, 80)).astype(np.float32)
        gwav = (0.1 * rng.standard_normal((4, fixed * hp.hop_size))).astype(
            np.float32
        )
        batch = shard_batch({"mel": gmel, "wav": gwav}, mesh)
        state, metrics = step(state, batch["mel"], batch["wav"])
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.gen_params))
    return float(jax.device_get(metrics["stft_loss"])), leaves


def _spawn_children(port: int, out: str, init_path: str):
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTEST_CURRENT_TEST", None)
        flags = [
            f
            for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append("--xla_force_host_platform_device_count=1")
        env["XLA_FLAGS"] = " ".join(flags)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, CHILD, out, str(N_STEPS), init_path],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        outputs.append(stdout.decode())
    return procs, outputs


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    assert len(jax.devices()) == 8
    out = str(tmp_path / "proc0.npz")

    init_path = str(tmp_path / "init.npz")
    # single-process reference first — it also exports the initial state the
    # children start from
    want_loss, want_leaves = _single_process_reference(init_path)

    # one retry with a fresh port: the free port can be stolen between
    # _free_port() and the coordinator's bind
    for attempt in range(2):
        procs, outputs = _spawn_children(_free_port(), out, init_path)
        if all(p.returncode == 0 for p in procs):
            break
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, o

    got = np.load(out)
    np.testing.assert_allclose(float(got["loss"]), want_loss, rtol=1e-5)
    # cross-host psum reduction order differs from single-process at float
    # rounding level; after 3 Adam steps that is ~1e-6 on params
    for i, leaf in enumerate(want_leaves):
        np.testing.assert_allclose(
            got[f"p{i}"], np.asarray(leaf), atol=1e-4,
            err_msg=f"generator param leaf {i} diverged",
        )
