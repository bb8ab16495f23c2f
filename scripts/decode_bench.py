"""Captioner decode benchmark: KV-cached sample vs beam-3 throughput.

Reference deployment shape (data/scripts/run_vision_captioner.sh:1-12):
BERT-base interface, batch 64, 8-frame condition (8x257 = 2056 tokens),
40 new tokens. Reports captions/s for mode in {sample, beam} and, with
--profile, dumps a jax.profiler trace of the beam step.

Usage: python scripts/decode_bench.py [--modes sample,beam] [--iters 5]
       python scripts/decode_bench.py --preset audio   # bs 128, 514-token
       condition (2x257 audio slices), the audio captioner deployment shape
       (data/scripts/run_audio_captioner.sh:1-11)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mico_tpu.config import BertConfig
from mico_tpu.generation import (
    cached_beam_generate,
    cached_generate,
    cached_generate_answers,
)
from mico_tpu.models.bert import init_bert

PRESETS = {
    "vision": dict(b=64, cond_tokens=2056),   # 8-frame video condition
    "audio": dict(b=128, cond_tokens=514),    # 2 audio slices
    # VQA eval: 25-token question prefix, 10 answer tokens
    "qa": dict(b=64, cond_tokens=2056, prefix_len=25, new_tokens=10),
}
NEW_TOKENS = 40


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="sample,beam")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--preset", default="vision", choices=sorted(PRESETS))
    ap.add_argument("--profile", default="")
    ap.add_argument("--int8", action="store_true",
                    help="int8 cross-K/V via the dequant-fused Pallas kernel")
    ap.add_argument("--split-heads", action="store_true",
                    help="store cross K/V split per head, (B, nh, Lk, hd) "
                         "row-major — contiguous per-(batch, head) DMA "
                         "streams (round-5 beam layout A/B)")
    args = ap.parse_args()
    i8 = bool(args.int8)
    if args.split_heads:
        from mico_tpu import generation as _gen

        _gen.CROSS_KV_SPLIT_HEADS = True
    dtype = jnp.dtype(args.dtype)
    preset = PRESETS[args.preset]
    B = preset["b"]
    COND_TOKENS = preset["cond_tokens"]
    new_tokens = preset.get("new_tokens", NEW_TOKENS)
    prefix_len = preset.get("prefix_len", 0)

    cfg = BertConfig()
    key = jax.random.PRNGKey(0)
    params = init_bert(key, cfg)
    cond = jax.random.normal(
        jax.random.PRNGKey(1), (B, COND_TOKENS, cfg.hidden_size), dtype
    )
    if prefix_len:
        q_ids = jax.random.randint(
            jax.random.PRNGKey(3), (B, prefix_len), 200, 20000, jnp.int32
        )
        q_mask = jnp.ones((B, prefix_len), jnp.int32)

        @jax.jit
        def run_qa(params, cond, q_ids, q_mask):
            return cached_generate_answers(
                params, cfg, q_ids, q_mask, cond,
                max_new_tokens=new_tokens, mode="greedy",
                compute_dtype=dtype, int8_cross_kv=i8,
            )

        @jax.jit
        def run_qa_beam(params, cond, q_ids, q_mask):
            # the Evaluator's deployed QA mode (evaluation/__init__.py:387)
            return cached_beam_generate(
                params, cfg, cond, max_new_tokens=new_tokens, num_beams=3,
                compute_dtype=dtype, prefix_ids=q_ids, prefix_mask=q_mask,
                int8_cross_kv=i8,
            )

    @jax.jit
    def run_sample(params, cond, rng):
        return cached_generate(
            params, cfg, cond, max_new_tokens=new_tokens, mode="sample",
            top_k=10, rng=rng, compute_dtype=dtype, int8_cross_kv=i8,
        )

    @jax.jit
    def run_beam(params, cond):
        return cached_beam_generate(
            params, cfg, cond, max_new_tokens=new_tokens, num_beams=3,
            compute_dtype=dtype, int8_cross_kv=i8,
        )

    import numpy as np

    fns = {
        "sample": lambda: run_sample(params, cond, jax.random.PRNGKey(2)),
        "beam": lambda: run_beam(params, cond),
    }
    if prefix_len:
        fns["greedy_qa"] = lambda: run_qa(params, cond, q_ids, q_mask)
        fns["beam_qa"] = lambda: run_qa_beam(params, cond, q_ids, q_mask)
    for mode in args.modes.split(","):
        fn = fns[mode]
        np.asarray(fn())  # compile + hard sync
        if args.profile:
            with jax.profiler.trace(args.profile):
                np.asarray(fn())
        # time with a host readback every iteration: through the axon
        # dispatch tunnel block_until_ready can return before the work is
        # done (grossly under-reports); device-to-host copy is a hard sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            np.asarray(fn())
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{mode}: {dt * 1e3:.1f} ms/batch  "
              f"{B / dt:.1f} items/s  ({dt / new_tokens * 1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
