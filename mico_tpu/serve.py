"""Omni-modal embedding serving pipeline.

The production inference surface (SURVEY §7 step 6): host-side threaded
decode + preprocessing feeding a device-side jit-compiled encoder with
double buffering — the TPU-native replacement for the reference's
per-sample `Processor(path) → model.forward_*` demo flow
(inference_demo.py:119-174) at deployment batch sizes.

Design:
  - a thread pool decodes media (C++ libav / cv2) and runs the fused
    device preprocessing per item; failures yield None (the reference
    processors' contract) and are reported, not fatal.
  - ready items are packed into fixed-size batches (last batch padded) —
    one compiled program per geometry.
  - `jax.device_put` dispatches the next batch while the current one
    computes (async dispatch = double buffering; no CUDA streams needed).
  - every modality of a batch folds into ONE shared-encoder pass
    (image = 1-frame video; audio tiled to 3 channels), keeping the MXU on
    large bf16 matmuls.
"""

from __future__ import annotations

import functools
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mico_tpu.config import MiCoConfig
from mico_tpu.media import AudioProcessor, ImageProcessor, VideoProcessor
from mico_tpu.models import mico as mico_mod


class EmbeddingPipeline:
    """Batched omni-modal embedding extraction.

    >>> pipe = EmbeddingPipeline(params, cfg, tokenizer)
    >>> out = pipe.embed_images(paths)              # (N, contra_dim)
    >>> out = pipe.embed_videos(paths)
    >>> out = pipe.embed_audio(paths)
    >>> out = pipe.embed_texts(strings)
    Failed items come back as zero rows + indices in `pipe.last_failures`.
    """

    def __init__(
        self,
        params: dict,
        cfg: MiCoConfig,
        tokenizer=None,
        batch_size: int = 16,
        io_workers: Optional[int] = None,
        melbins: int = 224,
        target_length: int = 224,
        resize_melbin_num: int = 224,
        fold_constants: bool = True,
    ):
        if fold_constants:
            # LN affines / LayerScale folded into the adjacent matmuls —
            # a reparametrization (mico.fold_inference_params); serving
            # never trains, so the canonical layout is not needed here
            params = mico_mod.fold_inference_params(params, cfg)
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.batch_size = batch_size
        if io_workers is None:
            # decode is CPU-bound (the C++ decoder runs one thread per item
            # by design — the pool IS the parallelism): size to the host;
            # video decode needs ~1 core per 1.35 videos/s, so big hosts
            # want the full core count (capped only to bound thread bloat)
            import os

            io_workers = max(2, min(32, os.cpu_count() or 1))
        self.pool = ThreadPoolExecutor(max_workers=io_workers)
        self.image_proc = ImageProcessor(
            cfg.vision_resolution, cfg.vision_encoder_type, training=False
        )
        self.video_proc = VideoProcessor(
            cfg.vision_resolution, cfg.vision_encoder_type,
            sample_num=cfg.max_vision_sample_num, training=False,
        )
        self.audio_proc = AudioProcessor(
            melbins=melbins, target_length=target_length,
            resize_melbin_num=resize_melbin_num,
            sample_num=cfg.max_audio_sample_num, training=False,
        )
        self.last_failures: List[int] = []

    # ---- jitted device programs (one per modality head) -------------------

    @functools.cached_property
    def _embed_pixels(self):
        cfg = self.cfg

        @functools.partial(jax.jit, static_argnames=("head",))
        def fn(params, pixels, head: str):
            tokens = mico_mod.forward_vision_encoder(params, cfg, pixels)
            feat = mico_mod.contra_head(
                params[f"contra_head_{head}"],
                mico_mod.pool_vision_for_contra(cfg, tokens),
            ).astype(jnp.float32)
            return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

        return fn

    @functools.cached_property
    def _embed_audio(self):
        cfg = self.cfg

        @jax.jit
        def fn(params, spectrograms):
            tokens = mico_mod.forward_audio_encoder(params, cfg, spectrograms)
            feat = mico_mod.contra_head(
                params["contra_head_a"],
                mico_mod.pool_audio_for_contra(cfg, tokens),
            ).astype(jnp.float32)
            return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

        return fn

    @functools.cached_property
    def _embed_text(self):
        cfg = self.cfg

        @jax.jit
        def fn(params, ids, mask):
            seq = mico_mod.forward_multimodal_encoder(
                params, cfg, ids, mask
            ).sequence_output
            feat = mico_mod.contra_head(
                params["contra_head_t"], mico_mod.pool_text_for_contra(seq)
            ).astype(jnp.float32)
            return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

        return fn

    # ---- host-side batching ------------------------------------------------

    def _run(self, paths: Sequence[str], proc, device_fn) -> np.ndarray:
        """Streaming threaded decode → fixed-size padded batches → async
        device dispatch. Decode runs a few batches ahead of the device
        (bounded window, so arbitrarily long path lists stream at constant
        host memory); device dispatch is async, so H2D of batch i+1
        overlaps batch i's compute."""
        self.last_failures = []
        bs = self.batch_size
        window = 4 * bs
        futures = [self.pool.submit(proc, p) for p in paths[:window]]
        next_submit = len(futures)

        outs = []
        sample_shape = None
        chunk, chunk_start = [], 0
        n = len(paths)

        def flush(chunk, start):
            nonlocal sample_shape
            if sample_shape is None:
                sample_shape = next(
                    (np.asarray(x).shape for x in chunk if x is not None),
                    None,
                )
            for j, x in enumerate(chunk):
                if x is None:
                    self.last_failures.append(start + j)
            if sample_shape is None:       # all failures so far: zero rows
                outs.append((start, len(chunk), None))
                return
            arr = np.zeros((bs, *sample_shape), np.float32)
            for j, x in enumerate(chunk):
                if x is not None:
                    arr[j] = x
            outs.append(
                (start, len(chunk),
                 device_fn(self.params, jax.device_put(arr)))
            )

        for i in range(n):
            fut = futures[i]
            futures[i] = None   # release: a Future retains its result array
            chunk.append(fut.result())
            futures.append(
                self.pool.submit(proc, paths[next_submit])
                if next_submit < n else None
            )
            next_submit += 1
            if len(chunk) == bs:
                flush(chunk, chunk_start)
                chunk, chunk_start = [], i + 1
        if chunk:
            flush(chunk, chunk_start)

        dim = next(
            (np.asarray(o).shape[-1] for _, _, o in outs if o is not None),
            self.cfg.contra_dim,
        )
        feats = np.zeros((n, dim), np.float32)
        for start, count, o in outs:
            if o is not None:
                feats[start : start + count] = np.asarray(o)[:count]
        for i in self.last_failures:
            feats[i] = 0.0
        return feats

    def embed_images(self, paths: Sequence[str]) -> np.ndarray:
        return self._run(
            paths,
            lambda p: self.image_proc(p),   # (1, 3, R, R): image = 1-frame
            lambda params, x: self._embed_pixels(params, x, head="v"),
        )

    def embed_videos(self, paths: Sequence[str]) -> np.ndarray:
        return self._run(
            paths,
            lambda p: self.video_proc(p),
            lambda params, x: self._embed_pixels(params, x, head="v"),
        )

    def embed_depth(self, paths: Sequence[str]) -> np.ndarray:
        return self._run(
            paths,
            lambda p: self.image_proc(p),
            lambda params, x: self._embed_pixels(params, x, head="d"),
        )

    def embed_audio(self, paths: Sequence[str]) -> np.ndarray:
        return self._run(
            paths,
            lambda p: self.audio_proc(p),
            self._embed_audio,
        )

    def embed_texts(self, texts: Sequence[str], max_length: int = 30
                    ) -> np.ndarray:
        self.last_failures = []
        enc = self.tok(list(texts), max_length=max_length)
        bs = self.batch_size
        n = len(texts)
        pad = (-n) % bs
        ids = np.pad(enc["input_ids"], ((0, pad), (0, 0)))
        mask = np.pad(enc["attention_mask"], ((0, pad), (0, 0)))
        outs = []
        for start in range(0, len(ids), bs):
            outs.append(
                self._embed_text(
                    self.params,
                    jnp.asarray(ids[start : start + bs]),
                    jnp.asarray(mask[start : start + bs]),
                )
            )
        return np.concatenate([np.asarray(o) for o in outs])[:n]

    def similarity(self, text_feats: np.ndarray, media_feats: np.ndarray
                   ) -> np.ndarray:
        return text_feats @ media_feats.T
