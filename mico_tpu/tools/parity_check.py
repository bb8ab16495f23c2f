"""End-to-end cosine parity harness vs the PyTorch reference.

The BASELINE gate: embedding cosine ≥ 0.999 against the reference
implementation on `example/test.{jpeg,flac,mp4}` with a real MiCo
checkpoint dir (README.md model zoo). Runs BOTH stacks side by side:

    python -m mico_tpu.tools.parity_check --pretrain_dir MiCo-g \
        [--reference /root/reference] [--device cpu]

Without a checkpoint dir it falls back to random weights shared across the
two stacks (converted torch→jax), which still proves implementation parity
— the same check the per-module golden tests make, composed end-to-end.
Prints one cosine per branch (image/video/audio/text) and PASS/FAIL at the
0.999 gate.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

GATE = 0.999


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    a = a.reshape(-1).astype(np.float64)
    b = b.reshape(-1).astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def _reference_model(reference_root: str, checkpoint=None, tiny=False):
    """Construct the reference MiCo (optionally tiny for a smoke run) on
    torch CPU. Imports the reference the same way the golden tests do."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../tests"))
    from reference_loader import load_mico_module

    mico_mod = load_mico_module()
    import torch
    from easydict import EasyDict

    opts = EasyDict(
        vision_resolution=224,
        vision_encoder_type="evaclip01_giant",
        checkpointing=False,
        frame_embedding_type="adaptive",
        max_vision_sample_num=4,
        max_audio_sample_num=2,
        max_depth_sample_num=2,
        contra_dim=512,
        pool_video=False,
        itm_ratio=0.1,
        beam_size=3,
        max_caption_len=40,
        max_omni_caption_len=70,
        max_subtitle_len=70,
    )
    cwd = os.getcwd()
    os.chdir(reference_root)       # relative tokenizer/config paths
    try:
        model = mico_mod.MiCo(opts)
    finally:
        os.chdir(cwd)
    model.eval()
    if checkpoint is not None:
        missing, unexpected = model.load_state_dict(checkpoint, strict=False)
        print(f"# reference load: {len(missing)} missing, "
              f"{len(unexpected)} unexpected keys")
    return model, opts


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain_dir", default=None,
                    help="MiCo checkpoint dir (ckpt/ + log/hps.json)")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--image", default=None)
    ap.add_argument("--audio", default=None)
    ap.add_argument("--video", default=None)
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="our stack's compute/param dtype; bfloat16 compares "
                         "the DEPLOYED precision (what bench.py runs) against "
                         "the fp32 torch reference")
    args = ap.parse_args(argv)
    image = args.image or f"{args.reference}/example/test.jpeg"
    audio = args.audio or f"{args.reference}/example/test.flac"
    video = args.video or f"{args.reference}/example/test.mp4"

    import torch

    from mico_tpu.config import mico_config_from_dict
    from mico_tpu.media import AudioProcessor, ImageProcessor, VideoProcessor
    from mico_tpu.models.mico import MiCoModel

    # ---- build both stacks over the SAME weights ----
    checkpoint = None
    if args.pretrain_dir:
        from mico_tpu.train.checkpoints import (
            _hf_trainer_state_dict,
            _latest_step,
            load_torch_state_dict,
        )

        sd = _hf_trainer_state_dict(args.pretrain_dir)
        if sd is None:
            _, path = _latest_step(
                os.path.join(args.pretrain_dir, "ckpt"), "model"
            )
            sd = load_torch_state_dict(path)
        checkpoint = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    ref, opts = _reference_model(args.reference, checkpoint)
    sd = ref.state_dict()
    model_cfg = dict(opts)
    model_cfg["compute_dtype"] = args.dtype
    cfg = mico_config_from_dict(model_cfg)
    ours = MiCoModel.from_pretrained(cfg, sd)

    import jax
    import jax.numpy as jnp

    if args.dtype == "bfloat16":
        # deployed-precision run: params cast like bench.py does
        ours.params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            ours.params,
        )

    results = {}

    # ---- image ----
    proc = ImageProcessor(224, cfg.vision_encoder_type, training=False)
    img = proc(image)[None]
    with torch.no_grad():
        v_ref = ref.forward_vision_encoder(torch.from_numpy(img))
        f_ref = ref.contra_head_v(ref.pool_vision_for_contra(v_ref)).numpy()
    v_our = ours.forward_vision_encoder(jnp.asarray(img))
    f_our = np.asarray(
        ours.contra_head("v", ours.pool_vision_for_contra(v_our))
    )
    results["image"] = cosine(f_ref, f_our)

    # ---- video ----
    if os.path.exists(video):
        vp = VideoProcessor(224, cfg.vision_encoder_type, sample_num=4,
                            training=False)
        vid = vp(video)[None]
        with torch.no_grad():
            v_ref = ref.forward_vision_encoder(torch.from_numpy(vid))
            f_ref = ref.contra_head_v(
                ref.pool_vision_for_contra(v_ref)
            ).numpy()
        v_our = ours.forward_vision_encoder(jnp.asarray(vid))
        f_our = np.asarray(
            ours.contra_head("v", ours.pool_vision_for_contra(v_our))
        )
        results["video"] = cosine(f_ref, f_our)

    # ---- audio ----
    if os.path.exists(audio):
        apz = AudioProcessor(melbins=224, target_length=224, sample_num=2,
                             training=False)
        aud = apz(audio)[None]
        with torch.no_grad():
            a_ref = ref.forward_audio_encoder(torch.from_numpy(aud))
            f_ref = ref.contra_head_a(
                ref.pool_audio_for_contra(a_ref)
            ).numpy()
        a_our = ours.forward_audio_encoder(jnp.asarray(aud))
        f_our = np.asarray(
            ours.contra_head("a", ours.pool_audio_for_contra(a_our))
        )
        results["audio"] = cosine(f_ref, f_our)

    # ---- text ----
    texts = ["a man is skiing in a snowy day.", "it's a hot day"]
    tok = ref.multimodal_encoder.tokenizer(
        texts, padding="max_length", truncation=True, max_length=30,
        return_tensors="pt",
    )
    with torch.no_grad():
        t_ref = ref.forward_multimodal_encoder(
            tok.input_ids, tok.attention_mask
        ).sequence_output
        f_ref = ref.contra_head_t(t_ref[:, 0]).numpy()
    t_our = ours.forward_multimodal_encoder(
        jnp.asarray(tok.input_ids.numpy()),
        jnp.asarray(tok.attention_mask.numpy()),
    )
    f_our = np.asarray(ours.contra_head("t", t_our[:, 0]))
    results["text"] = cosine(f_ref, f_our)

    ok = all(c >= GATE for c in results.values())
    for k, c in results.items():
        print(f"{k}: cosine {c:.6f} {'PASS' if c >= GATE else 'FAIL'}")
    print("overall:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
