"""Serve a checkpoint over HTTP with dynamic request batching.

    python tools/serve.py <checkpoint> <model_name> <config> [--port 8571]
        [--bucket_frames 64] [--max_batch 32] [--max_wait_ms 5] [--mesh all]

Thin positional wrapper over `fastvocoder serve` / MODE=serve
(fastvocoder_tpu/bin/serve.py).  Client example:

    import io, urllib.request, numpy as np
    mel = np.load("test.mel.npy").astype(np.float32).T     # (T, 80)
    buf = io.BytesIO(); np.save(buf, mel)
    req = urllib.request.Request(
        "http://127.0.0.1:8571/synthesize", data=buf.getvalue(), method="POST")
    wav = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 3:
        raise SystemExit(__doc__)
    checkpoint, model_name, config, *rest = argv

    from fastvocoder_tpu.bin.serve import run_serve

    run_serve(
        [
            "--checkpoint_path", checkpoint,
            "--model_name", model_name,
            "--config", config,
            *rest,
        ]
    )


if __name__ == "__main__":
    main()
