"""Serving layer: dynamic batching, the HTTP frontend, checkpoint serving."""

import io
import threading
import time
import urllib.request

import numpy as np
import pytest

from fastvocoder_tpu.serving import DynamicBatcher, make_server, run_server


def test_dynamic_batcher_coalesces_concurrent_requests():
    calls = []

    def synth(mels):
        calls.append(len(mels))
        time.sleep(0.05)  # let the next wave pile up
        return [np.full((m.shape[0],), float(m[0, 0]), np.float32) for m in mels]

    b = DynamicBatcher(synth, max_batch=8, max_wait_ms=100.0)
    futs = [
        b.submit(np.full((4, 2), i, np.float32)) for i in range(8)
    ]
    outs = [f.result(timeout=10) for f in futs]
    b.close()
    for i, out in enumerate(outs):
        np.testing.assert_array_equal(out, np.full((4,), float(i), np.float32))
    assert sum(calls) == 8
    assert len(calls) < 8, f"no coalescing happened: {calls}"
    assert b.requests_served == 8 and b.batches_run == len(calls)


def test_dynamic_batcher_propagates_errors_and_keeps_serving():
    def synth(mels):
        if any(float(m[0, 0]) < 0 for m in mels):
            raise ValueError("bad mel")
        return [m[:, 0] for m in mels]

    b = DynamicBatcher(synth, max_batch=1, max_wait_ms=1.0)
    bad = b.submit(np.full((2, 2), -1.0, np.float32))
    with pytest.raises(ValueError, match="bad mel"):
        bad.result(timeout=10)
    good = b.submit(np.full((2, 2), 3.0, np.float32))
    np.testing.assert_array_equal(good.result(timeout=10), [3.0, 3.0])
    b.close()


def test_dynamic_batcher_close_finishes_submitted_work():
    done = []

    def synth(mels):
        time.sleep(0.05)
        done.extend(float(m[0, 0]) for m in mels)
        return [m[:, 0] for m in mels]

    b = DynamicBatcher(synth, max_batch=2, max_wait_ms=50.0)
    futs = [b.submit(np.full((2, 2), i, np.float32)) for i in range(5)]
    b.close()
    assert sorted(done) == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert all(f.done() for f in futs)
    with pytest.raises(RuntimeError):
        b.submit(np.zeros((2, 2), np.float32))


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    try:
        resp = urllib.request.urlopen(req, timeout=30)
        return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_http_server_round_trip_and_validation():
    def synth(mels):
        return [np.repeat(m[:, 0], 3).astype(np.float32) for m in mels]

    httpd, batcher = make_server(
        synth, input_channels=80, model_name="stub", port=0
    )
    port = httpd.server_address[1]
    run_server(httpd, batcher)
    base = f"http://127.0.0.1:{port}"
    try:
        mel = np.arange(160, dtype=np.float32).reshape(2, 80)
        status, body = _post(base + "/synthesize", _npy_bytes(mel))
        assert status == 200
        wav = np.load(io.BytesIO(body))
        np.testing.assert_array_equal(wav, np.repeat(mel[:, 0], 3))

        # concurrent requests coalesce into fewer batches
        results = {}

        def hit(i):
            m = np.full((3, 80), i, np.float32)
            s, b2 = _post(base + "/synthesize", _npy_bytes(m))
            results[i] = (s, np.load(io.BytesIO(b2)))

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, (s, w) in results.items():
            assert s == 200
            np.testing.assert_array_equal(w, np.full((9,), float(i)))

        # validation errors
        status, body = _post(base + "/synthesize", b"not npy")
        assert status == 400
        status, body = _post(
            base + "/synthesize", _npy_bytes(np.zeros((2, 3), np.float32))
        )
        assert status == 400 and b"expected (T >= 1, 80)" in body
        status, body = _post(
            base + "/synthesize", _npy_bytes(np.zeros((0, 80), np.float32))
        )
        assert status == 400  # empty mel rejected before coalescing

        # health endpoint reports counters
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            import json

            h = json.loads(r.read())
        assert h["status"] == "ok" and h["requests_served"] >= 7
        assert h["batches_run"] <= h["requests_served"]
    finally:
        httpd.shutdown()
        batcher.close()


def test_serving_model_from_checkpoint(tmp_path, rng):
    """Checkpoint -> ServingModel -> wavs equal the direct batched path."""
    import jax

    from fastvocoder_tpu.hparams import MelGANConfig, ModelConfig
    from fastvocoder_tpu.models.batched import BatchedSynthesizer
    from fastvocoder_tpu.models.factory import build_generator
    from fastvocoder_tpu.serving import ServingModel
    from fastvocoder_tpu.train.checkpoint import (
        fuse_weight_norm,
        save_checkpoint,
    )

    cfg = ModelConfig(
        model_name="melgan", arch=MelGANConfig(channels=(8, 8, 8, 8, 8))
    )
    gen = build_generator(cfg)  # weight-norm (training) form for the ckpt
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), np.zeros((1, 8, 80), np.float32)
    )["params"]
    path = str(tmp_path / "ckpt.pth.tar")
    save_checkpoint(path, cfg, params)

    conf = str(tmp_path / "melgan.yaml")
    with open(conf, "w") as f:
        f.write(
            "in_channels: 80\nout_channels: 1\nkernel_size: 7\n"
            "channels: [8, 8, 8, 8, 8]\nupsample_scales: [10, 6, 2, 2]\n"
            "stack_kernel_size: 3\nstacks: 3\nuse_weight_norm: True\n"
            "use_causal_conv: False\nlamda_stft: 5.0\nmultiband: False\n"
            "use_feature_map_loss: True\n"
        )

    sm = ServingModel(path, conf, "melgan", bucket_frames=32, max_batch=4)
    mels = [
        rng.standard_normal((T, 80)).astype(np.float32) for T in (10, 25, 40)
    ]
    got = sm(mels)

    fused = fuse_weight_norm(params)
    gen_inf = build_generator(cfg, weight_norm=False)
    want = BatchedSynthesizer(
        lambda p, m: gen_inf.apply({"params": p}, m),
        fused,
        samples_per_frame=240,
        bucket_frames=32,
        max_batch=4,
    )(mels)
    for g, w, m in zip(got, want, mels):
        assert g.shape == (m.shape[0] * 240,)
        np.testing.assert_allclose(g, w, atol=1e-6)


def test_serve_driver_end_to_end(tmp_path, rng):
    """MODE=serve driver surface: checkpoint -> HTTP server -> waveform."""
    import jax

    from fastvocoder_tpu.bin.serve import run_serve
    from fastvocoder_tpu.hparams import MelGANConfig, ModelConfig
    from fastvocoder_tpu.models.factory import build_generator
    from fastvocoder_tpu.train.checkpoint import save_checkpoint

    cfg = ModelConfig(
        model_name="melgan", arch=MelGANConfig(channels=(8, 8, 8, 8, 8))
    )
    gen = build_generator(cfg)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), np.zeros((1, 8, 80), np.float32)
    )["params"]
    ckpt = str(tmp_path / "ckpt.pth.tar")
    save_checkpoint(ckpt, cfg, params)
    conf = str(tmp_path / "melgan.yaml")
    with open(conf, "w") as f:
        f.write(
            "in_channels: 80\nout_channels: 1\nkernel_size: 7\n"
            "channels: [8, 8, 8, 8, 8]\nupsample_scales: [10, 6, 2, 2]\n"
            "stack_kernel_size: 3\nstacks: 3\nuse_weight_norm: True\n"
            "use_causal_conv: False\nlamda_stft: 5.0\nmultiband: False\n"
            "use_feature_map_loss: True\n"
        )

    httpd, batcher = run_serve(
        [
            "--checkpoint_path", ckpt, "--model_name", "melgan",
            "--config", conf, "--port", "0", "--bucket_frames", "16",
        ],
        block=False,
    )
    port = httpd.server_address[1]
    try:
        mel = rng.standard_normal((12, 80)).astype(np.float32)
        status, body = _post(
            f"http://127.0.0.1:{port}/synthesize", _npy_bytes(mel)
        )
        assert status == 200
        wav = np.load(io.BytesIO(body))
        assert wav.shape == (12 * 240,) and np.isfinite(wav).all()
    finally:
        httpd.shutdown()
        batcher.close()


def test_per_request_validate_isolates_bad_request():
    """A request failing validate() gets its own 400 BEFORE coalescing;
    concurrent good requests in the same batching window still get 200."""
    import threading as th

    def synth(mels):
        return [np.repeat(m[:, 0], 2).astype(np.float32) for m in mels]

    def validate(mel):
        if float(mel[0, 0]) < 0:
            raise ValueError("pattern covers too few samples (stub)")

    httpd, batcher = make_server(
        synth, input_channels=80, model_name="stub", port=0,
        max_wait_ms=50.0, validate=validate,
    )
    port = httpd.server_address[1]
    run_server(httpd, batcher)
    base = f"http://127.0.0.1:{port}"
    results = {}

    def hit(i, val):
        m = np.full((3, 80), val, np.float32)
        s, b = _post(base + "/synthesize", _npy_bytes(m))
        results[i] = (s, b)

    try:
        threads = [
            th.Thread(target=hit, args=(i, -1.0 if i == 2 else float(i)))
            for i in range(5)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results[2][0] == 400 and b"pattern covers" in results[2][1]
        for i in (0, 1, 3, 4):
            s, b = results[i]
            assert s == 200
            np.testing.assert_array_equal(
                np.load(io.BytesIO(b)), np.full((6,), float(i))
            )
    finally:
        httpd.shutdown()
        batcher.close()


def test_batcher_backpressure_and_stats():
    """A full pending queue raises QueueFull (HTTP 503); stats() reports
    rolling latency percentiles and mean batch size."""
    import threading as th

    from fastvocoder_tpu.serving.batcher import QueueFull

    release = th.Event()

    def synth(mels):
        release.wait(10)
        return [m[:, 0] for m in mels]

    b = DynamicBatcher(synth, max_batch=1, max_wait_ms=1.0, max_pending=2)
    futs = []
    # worker takes one request and blocks in synth; 2 more fill the queue
    futs.append(b.submit(np.zeros((2, 2), np.float32)))
    time.sleep(0.2)
    futs.append(b.submit(np.zeros((2, 2), np.float32)))
    futs.append(b.submit(np.zeros((2, 2), np.float32)))
    with pytest.raises(QueueFull):
        b.submit(np.zeros((2, 2), np.float32))
    release.set()
    for f in futs:
        f.result(timeout=10)
    b.close()
    s = b.stats()
    assert s["requests_served"] == 3 and s["pending"] == 0
    assert s["latency_ms_p50"] is not None and s["latency_ms_p95"] >= s["latency_ms_p50"]
    assert s["mean_batch_size"] == 1.0


def test_http_503_on_backpressure():
    import threading as th

    release = th.Event()

    def synth(mels):
        release.wait(10)
        return [m[:, 0] for m in mels]

    httpd, batcher = make_server(
        synth, input_channels=80, model_name="stub", port=0,
        max_batch=1, max_wait_ms=1.0, max_pending=1,
    )
    port = httpd.server_address[1]
    run_server(httpd, batcher)
    base = f"http://127.0.0.1:{port}"
    mel = _npy_bytes(np.zeros((2, 80), np.float32))
    try:
        codes = {}

        def hit(i):
            codes[i], _ = _post(base + "/synthesize", mel)

        threads = [th.Thread(target=hit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
            time.sleep(0.1)  # 1 in-flight, 1 queued, rest shed
        time.sleep(0.3)
        release.set()
        for t in threads:
            t.join()
        assert 503 in codes.values(), codes
        assert list(codes.values()).count(200) >= 2, codes
    finally:
        httpd.shutdown()
        batcher.close()
