"""Serving driver: HTTP frontend with dynamic request batching.

Beyond the reference (whose fastest surface is the local RTF loop,
reference bin/test.py:123-132): `MODE=serve` / `fastvocoder serve` stands
up `fastvocoder_tpu/serving/` around any checkpoint.  See tools/serve.py's
docstring for a client example.
"""

from __future__ import annotations

import argparse


def run_serve(argv=None, block: bool = True):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_path", required=True)
    p.add_argument(
        "--model_name", required=True,
        help="melgan | hifigan | multiband-hifigan | basis-melgan | nhv",
    )
    p.add_argument("--config", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8571)
    p.add_argument("--bucket_frames", type=int, default=64)
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument(
        "--mesh", default="",
        help="'all' = shard request batches over every local device",
    )
    p.add_argument("--bf16", type=int, default=0)
    p.add_argument(
        "--warmup_frames", type=int, default=0,
        help="pre-compile serving programs for utterances up to N mel "
        "frames before accepting traffic (first compile is slow on TPU)",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fastvocoder_tpu.parallel.mesh import make_mesh
    from fastvocoder_tpu.serving import ServingModel, make_server, run_server

    mesh = make_mesh(jax.devices()) if args.mesh == "all" else None
    model = ServingModel(
        args.checkpoint_path,
        args.config,
        args.model_name,
        bucket_frames=args.bucket_frames,
        max_batch=args.max_batch,
        mesh=mesh,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    if args.warmup_frames:
        n = model.warmup(args.warmup_frames)
        print(f"warmed {n} serving programs", flush=True)
    httpd, batcher = make_server(
        model,
        input_channels=model.input_channels,
        model_name=args.model_name,
        host=args.host,
        port=args.port,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        validate=model.validate,
    )
    port = httpd.server_address[1]  # resolves --port 0
    print(
        f"serving {args.model_name} on http://{args.host}:{port}",
        flush=True,
    )
    thread = run_server(httpd, batcher)
    if not block:  # embedding/tests: caller owns shutdown
        return httpd, batcher
    try:
        thread.join()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        batcher.close()


if __name__ == "__main__":
    run_serve()
