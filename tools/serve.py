"""Serve a published checkpoint over HTTP with dynamic request batching.

    python tools/serve.py <checkpoint> <model_name> <config> [--port 8571]
        [--bucket_frames 64] [--max_batch 32] [--max_wait_ms 5]
        [--mesh all]   # shard batches over every local chip

Client example:

    import io, urllib.request, numpy as np
    mel = np.load("test.mel.npy").astype(np.float32).T     # (T, 80)
    buf = io.BytesIO(); np.save(buf, mel)
    req = urllib.request.Request(
        "http://127.0.0.1:8571/synthesize", data=buf.getvalue(), method="POST")
    wav = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint")
    p.add_argument(
        "model_name",
        help="melgan | hifigan | multiband-hifigan | basis-melgan | nhv",
    )
    p.add_argument("config")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8571)
    p.add_argument("--bucket_frames", type=int, default=64)
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument(
        "--mesh", default="", help="'all' = shard batches over local devices"
    )
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fastvocoder_tpu.parallel.mesh import make_mesh
    from fastvocoder_tpu.serving import ServingModel, make_server, run_server

    mesh = make_mesh(jax.devices()) if args.mesh == "all" else None
    model = ServingModel(
        args.checkpoint,
        args.config,
        args.model_name,
        bucket_frames=args.bucket_frames,
        max_batch=args.max_batch,
        mesh=mesh,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    httpd, batcher = make_server(
        model,
        input_channels=model.input_channels,
        model_name=args.model_name,
        host=args.host,
        port=args.port,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
    )
    print(f"serving {args.model_name} on http://{args.host}:{args.port}")
    try:
        run_server(httpd, batcher).join()
    except KeyboardInterrupt:
        httpd.shutdown()
        batcher.close()


if __name__ == "__main__":
    main()
