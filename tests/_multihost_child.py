"""Child process for the multi-host DP test (spawned by test_multihost.py).

Each of 2 processes owns 1 CPU device; `jax.distributed.initialize`
(driven by JAX_* env vars) forms a 2-device global mesh.  Runs 3 tiny
pre-adversarial train steps on a deterministic global batch and, on process
0, dumps the resulting generator params for comparison with a single-process
run of the same program.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from fastvocoder_tpu.hparams import HP, MelGANConfig, ModelConfig, TINY_DISC
from fastvocoder_tpu.parallel import (
    compile_train_step_no_weight,
    make_mesh,
    maybe_initialize_distributed,
    replicate_state,
    shard_batch,
)
from fastvocoder_tpu.train.trainer import make_trainer


def main():
    out_path = sys.argv[1]
    n_steps = int(sys.argv[2])
    init_path = sys.argv[3]

    pid, pcount = maybe_initialize_distributed()
    assert pcount == 2, pcount
    assert jax.local_device_count() == 1, jax.local_device_count()
    assert len(jax.devices()) == 2, len(jax.devices())

    fixed = 10
    hp = HP.replace(fixed_length=fixed)
    cfg = ModelConfig(
        model_name="melgan",
        arch=MelGANConfig(channels=(8, 8, 8, 8, 8)),
        lambda_stft=1.0,
    )
    trainer = make_trainer(cfg, hp=hp, disc_cfg=TINY_DISC)
    mesh = make_mesh()
    # the parent ships the initial TrainState; rebuilding it here would
    # recompile the init program per child (the multi-process topology gets
    # its own compilation-cache key).  eval_shape gives the pytree structure
    # without compiling anything.
    abs_state = jax.eval_shape(trainer.init_state, jax.random.PRNGKey(0))
    treedef = jax.tree_util.tree_structure(abs_state)
    init = np.load(init_path)
    leaves = [init[f"l{i}"] for i in range(len(init.files))]
    state0 = jax.tree_util.tree_unflatten(treedef, leaves)
    state = replicate_state(state0, mesh)
    step = compile_train_step_no_weight(trainer.pre_adv_step, mesh)

    rng = np.random.default_rng(0)
    for i in range(n_steps):
        # every process generates the identical GLOBAL batch, then feeds its
        # local half — mimicking batch_iterator's shard_index/shard_count
        gmel = rng.standard_normal((4, fixed, 80)).astype(np.float32)
        gwav = (0.1 * rng.standard_normal((4, fixed * hp.hop_size))).astype(
            np.float32
        )
        lo, hi = pid * 2, (pid + 1) * 2
        batch = shard_batch({"mel": gmel[lo:hi], "wav": gwav[lo:hi]}, mesh)
        state, metrics = step(state, batch["mel"], batch["wav"])

    loss = float(jax.device_get(metrics["stft_loss"]))
    assert np.isfinite(loss)
    if pid == 0:
        leaves = jax.tree_util.tree_leaves(jax.device_get(state.gen_params))
        np.savez(
            out_path,
            loss=np.float32(loss),
            **{f"p{i}": np.asarray(l) for i, l in enumerate(leaves)},
        )
    print(f"child {pid} done: stft_loss={loss}")


if __name__ == "__main__":
    main()
