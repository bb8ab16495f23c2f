"""End-to-end serving bench: host decode + preprocess + device embed.

SURVEY §7 "hard parts" requires the host media path (C++ libav decode,
threaded, async device dispatch) to sustain the chip's embedding rate —
this measures it with the reference example media
(/root/reference/example/test.{jpeg,mp4,flac}) replicated N times through
the full EmbeddingPipeline on the flagship ViT-g config.

Prints items/s per modality (end-to-end: file -> normalized embedding on
host) and the host-decode-only rate for comparison with bench.py's
device-only samples/s.

Usage: python scripts/serve_bench.py [--n 64] [--modalities image,video,audio]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")

EXAMPLE = "/root/reference/example"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--modalities", default="image,video,audio")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--io_workers", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mico_tpu.config import MiCoConfig
    from mico_tpu.models.mico import init_mico
    from mico_tpu.serve import EmbeddingPipeline
    from mico_tpu.text import BertWordPieceTokenizer

    cfg = MiCoConfig(
        vision_encoder_type="evaclip01_giant",
        compute_dtype="bfloat16",
        max_vision_sample_num=4,
        max_audio_sample_num=2,
        use_flash_attention=True,
    )
    params = init_mico(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    tok = BertWordPieceTokenizer("/root/reference/model/tokenizer/vocab.txt")
    pipe = EmbeddingPipeline(params, cfg, tok, batch_size=args.batch_size,
                             io_workers=args.io_workers)

    jobs = {
        "image": (pipe.embed_images, pipe.image_proc,
                  os.path.join(EXAMPLE, "test.jpeg")),
        "video": (pipe.embed_videos, pipe.video_proc,
                  os.path.join(EXAMPLE, "test.mp4")),
        "audio": (pipe.embed_audio, pipe.audio_proc,
                  os.path.join(EXAMPLE, "test.flac")),
    }
    for mod in args.modalities.split(","):
        fn, proc, path = jobs[mod]
        paths = [path] * args.n
        fn(paths[: args.batch_size])  # compile + warm caches
        t0 = time.perf_counter()
        out = fn(paths)
        dt = time.perf_counter() - t0
        assert out.shape[0] == args.n and not pipe.last_failures
        # host-only rate: decode+preprocess through the same thread pool
        t0 = time.perf_counter()
        for r in [pipe.pool.submit(proc, p) for p in paths]:
            r.result()
        dt_host = time.perf_counter() - t0
        print(f"{mod:6s} end-to-end {args.n / dt:7.1f} items/s   "
              f"host decode+preproc only {args.n / dt_host:7.1f} items/s")


if __name__ == "__main__":
    main()
