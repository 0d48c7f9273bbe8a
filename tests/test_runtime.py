"""Runtime utilities: step timer semantics and device prefetch."""

import numpy as np

from fastvocoder_tpu.runtime import StepTimer, prefetch_to_device


def test_step_timer_window_compaction():
    t = StepTimer(clear_time=3)
    for _ in range(5):
        t.start()
        t.stop()
    # compaction keeps the window bounded (reference bin/train.py:250-254)
    assert len(t.window) <= 3 + 1
    assert t.mean >= 0
    assert t.eta_seconds(10, 20) == 10 * t.mean


def test_prefetch_to_device_yields_all_batches(rng):
    batches = [
        {"mel": rng.standard_normal((2, 4, 8)).astype(np.float32)} for _ in range(5)
    ]
    out = list(prefetch_to_device(iter(batches), mesh=None, size=2))
    assert len(out) == 5
    for a, b in zip(out, batches):
        np.testing.assert_array_equal(np.asarray(a["mel"]), b["mel"])


def test_prefetch_propagates_errors(rng):
    def gen():
        yield {"x": np.zeros((1,), np.float32)}
        raise RuntimeError("boom")

    it = prefetch_to_device(gen(), mesh=None)
    next(it)
    try:
        next(it)
        raised = False
    except RuntimeError as e:
        raised = "boom" in str(e)
    assert raised


def test_async_checkpoint_writer_propagates_errors(tmp_path):
    """wait() must surface a failed background save, not swallow it."""
    import pytest

    from fastvocoder_tpu.train.checkpoint import AsyncCheckpointWriter

    w = AsyncCheckpointWriter()
    # invalid target directory -> the worker's save fails
    w.submit(str(tmp_path / "no_such_dir" / "x.pth.tar"), None, {})
    with pytest.raises(Exception):
        w.wait()


def test_cli_entry_dispatch():
    import pytest

    from fastvocoder_tpu.bin.cli import main

    assert main([]) == 0
    assert main(["--help"]) == 0
    with pytest.raises(SystemExit):
        main(["nonsense"])


def test_async_checkpoint_writer_survives_donated_buffers(tmp_path):
    """The train step donates its state, so the arrays passed to submit()
    are deleted by the very next step — the writer must have snapshotted
    them (regression: "Array has been deleted with shape=float32[256]"
    from a real 300-step TPU driver run)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from fastvocoder_tpu.hparams import MelGANConfig, ModelConfig
    from fastvocoder_tpu.models.factory import build_generator
    from fastvocoder_tpu.train.checkpoint import AsyncCheckpointWriter

    cfg = ModelConfig(
        model_name="melgan", arch=MelGANConfig(channels=(8, 8, 8, 8, 8))
    )
    gen = build_generator(cfg)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), np.zeros((1, 8, 80), np.float32)
    )["params"]
    want = float(
        jnp.sum(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(params)))
    )

    w = AsyncCheckpointWriter()
    path = str(tmp_path / "ckpt.pth.tar")
    w.submit(path, cfg, params, None, None, None, step=1)
    # simulate the next donating step invalidating every submitted buffer
    for leaf in jax.tree_util.tree_leaves(params):
        leaf.delete()
    w.wait()

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    got = float(sum(t.sum() for t in ckpt["model"].values()))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_prefetch_early_exit_unblocks_producer(rng):
    """Abandoning the generator mid-stream (a max_steps return) must let the
    producer thread exit instead of blocking forever on the full queue."""
    import threading
    import time

    import numpy as np

    n_before = threading.active_count()
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield {"x": np.full((4,), i, np.float32)}

    it = prefetch_to_device(gen(), mesh=None, size=2)
    assert float(next(it)["x"][0]) == 0.0
    it.close()  # what GC does when the consumer returns early

    deadline = time.time() + 5.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before, "producer thread leaked"
    assert len(produced) < 100, "producer ran the whole stream after close"

def test_prefetch_slow_consumer_sees_end_of_stream(rng):
    """End-of-stream with the queue full (consumer slower than producer) must
    still deliver the end sentinel — a dropped sentinel deadlocks the
    consumer's next q.get() after the final batch."""
    import time

    import numpy as np

    batches = [{"x": np.full((4,), i, np.float32)} for i in range(4)]
    got = []
    start = time.time()
    for b in prefetch_to_device(iter(batches), mesh=None, size=2):
        time.sleep(0.2)  # let the producer finish with the queue full
        got.append(float(b["x"][0]))
        assert time.time() - start < 30.0, "consumer hung after last batch"
    assert got == [0.0, 1.0, 2.0, 3.0]


def test_prefetch_error_reaches_slow_consumer(rng):
    """Producer exceptions must propagate even when the queue was full at the
    moment the iterator raised."""
    import time

    import numpy as np
    import pytest

    def gen():
        for i in range(3):
            yield {"x": np.full((4,), i, np.float32)}
        raise RuntimeError("boom")

    it = prefetch_to_device(gen(), mesh=None, size=1)
    with pytest.raises(RuntimeError, match="boom"):
        for _ in range(10):
            next(it)
            time.sleep(0.2)
