"""Omni-modal inference demo — API parity with the reference
inference_demo.py: load the released MiCo-ViT-g-14 checkpoint dir (or a
native .npz checkpoint dir), embed image/video/audio/text, score retrieval +
ITM, and generate a caption with beam search.

Usage:
    python inference_demo.py --pretrain_dir MiCo-g \
        [--image example/test.jpeg] [--video example/test.mp4] \
        [--audio example/test.flac]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain_dir", default="MiCo-g")
    ap.add_argument("--image", default="/root/reference/example/test.jpeg")
    ap.add_argument("--video", default="/root/reference/example/test.mp4")
    ap.add_argument("--audio", default="/root/reference/example/test.flac")
    ap.add_argument("--vocab", default="/root/reference/model/tokenizer/vocab.txt")
    ap.add_argument("--resolution", type=int, default=224)
    # demo fbank geometry: 224x224 "spectrogram images"
    # (reference model/audioprocessor.py:81-85)
    ap.add_argument("--melbins", type=int, default=224)
    ap.add_argument("--target_length", type=int, default=224)
    ap.add_argument("--resize_melbin_num", type=int, default=224)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from mico_tpu import generation
    from mico_tpu.media import AudioProcessor, ImageProcessor, VideoProcessor
    from mico_tpu.models.mico import MiCoModel
    from mico_tpu.text import BertWordPieceTokenizer
    from mico_tpu.train.checkpoints import load_from_pretrained_dir

    params, cfg = load_from_pretrained_dir(
        args.pretrain_dir,
        video_resolution=args.resolution,
        config_overrides={"compute_dtype": args.dtype},
    )
    model = MiCoModel(params, cfg)
    tokenizer = BertWordPieceTokenizer(args.vocab)

    # ---- image branch (image = 1-frame video) ----
    proc = ImageProcessor(args.resolution, cfg.vision_encoder_type, training=False)
    image = proc(args.image)[None]                       # (1, 1, 3, R, R)
    vision_output = model.forward_vision_encoder(jnp.asarray(image))
    feat_v = model.contra_head("v", model.pool_vision_for_contra(vision_output))
    feat_v = feat_v / jnp.linalg.norm(feat_v, axis=-1, keepdims=True)

    # ---- text branch ----
    texts = ["a man is skiing in a snowy day.", "it's a hot day"]
    toks = tokenizer(texts, max_length=30)
    seq = model.forward_multimodal_encoder(
        jnp.asarray(toks["input_ids"]), jnp.asarray(toks["attention_mask"])
    )
    feat_t = model.contra_head("t", model.pool_text_for_contra(seq))
    feat_t = feat_t / jnp.linalg.norm(feat_t, axis=-1, keepdims=True)

    sim_t2v = np.asarray(feat_t @ feat_v.T)
    print("sim_t2v:", sim_t2v)

    # ---- ITM scores ----
    import jax

    cond = model.get_multimodal_forward_input_vision(vision_output)
    # one image scored against every caption (the reference relies on torch
    # batch-dim broadcasting here, inference_demo.py:153-156)
    cond_itm = jnp.broadcast_to(
        cond, (toks["input_ids"].shape[0],) + cond.shape[1:]
    )
    slice_out = model.forward_multimodal_encoder(
        jnp.asarray(toks["input_ids"]), jnp.asarray(toks["attention_mask"]),
        cond_itm,
    )
    itm = np.asarray(jax.nn.softmax(model.itm_head(slice_out[:, 0]), axis=1)[:, 1])
    print("itm scores:", itm)

    # ---- caption generation (beam, length_penalty 0.6) ----
    out = generation.generate(
        model.params["bert"], cfg.bert_config, cond,
        max_new_tokens=cfg.max_caption_len, mode="beam",
        num_beams=cfg.beam_size, length_penalty=0.6,
    )
    captions = tokenizer.batch_decode(np.asarray(out)[:, 1:])
    print("caption:", captions)

    # ---- video branch ----
    if os.path.exists(args.video):
        vp = VideoProcessor(
            args.resolution, cfg.vision_encoder_type,
            sample_num=cfg.max_vision_sample_num, data_format="raw",
            training=False,
        )
        video = vp(args.video)[None]
        vout = model.forward_vision_encoder(jnp.asarray(video))
        fv = model.contra_head("v", model.pool_vision_for_contra(vout))
        fv = fv / jnp.linalg.norm(fv, axis=-1, keepdims=True)
        print("video sim:", np.asarray(feat_t @ fv.T))

    # ---- audio branch ----
    if os.path.exists(args.audio):
        apz = AudioProcessor(
            melbins=args.melbins, target_length=args.target_length,
            resize_melbin_num=args.resize_melbin_num,
            sample_num=cfg.max_audio_sample_num, training=False,
        )
        audio = apz(args.audio)[None]
        aout = model.forward_audio_encoder(jnp.asarray(audio))
        fa = model.contra_head("a", model.pool_audio_for_contra(aout))
        fa = fa / jnp.linalg.norm(fa, axis=-1, keepdims=True)
        print("audio sim:", np.asarray(feat_t @ fa.T))


if __name__ == "__main__":
    main()
