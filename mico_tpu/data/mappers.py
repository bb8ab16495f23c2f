"""Vision / audio sample mappers.

Capability-parity rebuilds of the reference mappers:
  - VisionMapper (reference: data/data/vision_mapper.py:16-211) — formats
    `video_rawvideo` (container decode w/ extension fallback), `video_frame`
    (sorted jpg directories), `image_rawimage` (ext fallback, zeros for the
    known-missing llava set), `video_feats` (h5/npy clip features with
    mean-pool bucketing).
  - AudioMapper (reference: data/data/audio_mapper.py:9-94) — AST
    (mean-centered waveform, hanning window, native sample rate) vs BEATs
    (16 kHz, 2**15 scaling, povey window) fbank settings, per-encoder
    mean/std, zero-pad + fixed-window slicing, chunk sampling, zeros on
    missing file.

TPU-first: decode runs on host (cv2 / native libav); the fbank itself is the
DFT-matmul device kernel (mico_tpu/ops/fbank.py). Frame selection happens on
host before decode so only the sampled frames are ever decoded.
"""

from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np

from mico_tpu.media.audio_io import load_waveform
from mico_tpu.media.chunking import sample_chunk_indices
from mico_tpu.media.image_io import load_image_chw
from mico_tpu.media.processors import (
    _resize_normalize_host,
    _stats_for,
    _random_resized_crop,
    _resize_short_center_crop,
)
from mico_tpu.media.video_io import read_frames_chw, video_num_frames
from mico_tpu.ops.fbank import FbankConfig, kaldi_fbank_np

VIDEO_EXT_FALLBACK = ("", ".mp4", ".avi", ".webm", ".mkv")
IMAGE_EXT_FALLBACK = ("", ".jpg", ".JPEG")
AUDIO_EXT_FALLBACK = ("", ".wav", ".mp3", ".mkv")


def _resolve_path(base: str, id_: str, fallbacks) -> Optional[str]:
    for ext in fallbacks:
        p = os.path.join(base, str(id_)) + ext
        if os.path.exists(p):
            return p
    return None


class VisionMapper:
    """d_cfg keys: vision (root dir / h5 path), name, training, vision_format,
    vision_sample_num, optional vision_transforms / dense_extraction /
    extract_fps / frame_fps; model_cfg keys: vision_resolution,
    vision_encoder_type."""

    def __init__(self, d_cfg: dict, model_cfg: dict, seed: Optional[int] = None):
        self.vision = d_cfg["vision"]
        self.name = d_cfg.get("name", "dataset")
        self.training = bool(d_cfg.get("training", True))
        self.vision_format = d_cfg["vision_format"]
        self.dense_extraction = bool(d_cfg.get("dense_extraction", False))
        self.extract_fps = d_cfg.get("extract_fps")
        self.frame_fps = d_cfg.get("frame_fps")
        if self.vision_format.startswith("video"):
            self.sample_num = int(d_cfg["vision_sample_num"])
        self.resolution = int(model_cfg.get("vision_resolution", 224))
        self.mean, self.std = _stats_for(
            model_cfg.get("vision_encoder_type", "evaclip01_giant")
        )
        self.vision_transforms = d_cfg.get("vision_transforms", "none")
        if self.vision_transforms not in ("none", "crop_flip"):
            raise NotImplementedError(self.vision_transforms)
        self._rng = random.Random(seed)

    # ---- transforms (reference vision_mapper.py:54-78) ----

    def _transform(self, frames01: np.ndarray) -> np.ndarray:
        """(n,3,H,W) float [0,1] → (n,3,R,R) normalized float32."""
        r = self.resolution
        if self.vision_transforms == "crop_flip":
            if self.training:
                frames01 = _random_resized_crop(frames01, r, self._rng)
                if self._rng.random() < 0.5:
                    frames01 = frames01[..., ::-1].copy()
                m = np.asarray(self.mean, np.float32).reshape(1, 3, 1, 1)
                s = np.asarray(self.std, np.float32).reshape(1, 3, 1, 1)
                return (frames01.astype(np.float32) - m) / s
            frames01 = _resize_short_center_crop(frames01, r)
            m = np.asarray(self.mean, np.float32).reshape(1, 3, 1, 1)
            s = np.asarray(self.std, np.float32).reshape(1, 3, 1, 1)
            return (frames01.astype(np.float32) - m) / s
        # 'none': host resize+normalize (numpy twin of the device op —
        # loader threads must not dispatch per-item device programs)
        return _resize_normalize_host(
            frames01, self.resolution, tuple(self.mean), tuple(self.std)
        )

    # ---- readers ----

    def read(self, id_) -> Optional[np.ndarray]:
        try:
            if self.vision_format == "video_rawvideo":
                return self._read_rawvideo(id_)
            if self.vision_format == "video_frame":
                return self._read_frames(id_)
            if self.vision_format == "image_rawimage":
                return self._read_image(id_)
            if self.vision_format == "video_feats":
                return self._read_feats(id_)
            raise NotImplementedError(self.vision_format)
        except NotImplementedError:
            raise
        except Exception as e:  # noqa: BLE001 — corrupt sample → None → resample
            print(e, id_)
            return None

    def _read_rawvideo(self, id_) -> np.ndarray:
        path = _resolve_path(self.vision, id_, VIDEO_EXT_FALLBACK)
        if path is None:
            raise FileNotFoundError(f"{id_} under {self.vision}")
        return self._read_rawvideo_path(path)

    def _read_rawvideo_path(self, path: str) -> np.ndarray:
        n = video_num_frames(path)
        sample_num = self.sample_num
        if self.dense_extraction:
            import cv2

            cap = cv2.VideoCapture(path)
            fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
            cap.release()
            sample_num = max(1, int(n * self.extract_fps / fps))
        idx = sample_chunk_indices(n, sample_num, self.training, self._rng)
        # read_frames_chw already returns float32 RGB in [0,1]
        return self._transform(read_frames_chw(path, idx))

    def _read_frames(self, id_) -> np.ndarray:
        frame_dir = os.path.join(self.vision, str(id_))
        names = sorted(os.listdir(frame_dir))
        sample_num = self.sample_num
        if self.dense_extraction:
            sample_num = max(1, int(len(names) * self.extract_fps / self.frame_fps))
        idx = sample_chunk_indices(len(names), sample_num, self.training, self._rng)
        # load_image_chw already returns float32 RGB in [0,1]
        frames = np.stack(
            [load_image_chw(os.path.join(frame_dir, names[i])) for i in idx]
        )
        return self._transform(frames)

    def _read_image(self, id_) -> np.ndarray:
        path = _resolve_path(self.vision, id_, IMAGE_EXT_FALLBACK)
        if path is None:
            # reference returns zeros only for the known-missing llava set
            # (vision_mapper.py:196-199); we log and zero-fill for any set
            print("not have im", id_)
            return np.zeros((1, 3, self.resolution, self.resolution), np.float32)
        # load_image_chw already returns float32 RGB in [0,1]
        return self._transform(load_image_chw(path)[None])

    def _read_feats(self, id_) -> np.ndarray:
        """Pre-extracted clip features: h5 (`c3d_features` or flat) or
        per-id .npy; L2-normalize rows then mean-pool into `num_pre_clips`
        buckets (reference vision_mapper.py:86-117)."""
        if self.vision.endswith("hdf5") or self.vision.endswith("h5"):
            import h5py

            with h5py.File(self.vision, "r") as f:
                g = f[str(id_)]
                feat = g["c3d_features"][:] if "c3d_features" in g else g[:]
        else:
            feat = np.load(os.path.join(self.vision, f"{id_}.npy"))
        feat = feat.astype(np.float32)
        feat /= np.maximum(np.linalg.norm(feat, axis=1, keepdims=True), 1e-12)
        num_pre_clips = int(getattr(self, "num_pre_clips", 32))
        n_src = feat.shape[0]
        idxs = np.round(
            np.arange(0, num_pre_clips + 1) / num_pre_clips * n_src
        ).astype(np.int64)
        idxs = np.clip(idxs, 0, n_src - 1)
        out = []
        for i in range(num_pre_clips):
            s, e = idxs[i], idxs[i + 1]
            out.append(feat[s:e].mean(axis=0) if s < e else feat[s])
        return np.stack(out)


class DepthMapper:
    """Depth maps for the MiCo 'd' modality (beyond-reference: the reference
    consumes depth only at the model level, model/mico.py:145-148 — its data
    engine has no depth loader, so the omni tid/tvad mixes could never train
    from disk). d_cfg keys: depth (root dir of per-id depth images; grayscale
    or RGB — cv2 replicates gray to 3 channels), optional depth_sample_num
    (stacked maps per id via `{id}_k` suffixes; default 1). Depth rides the
    shared vision encoder, so it uses the vision resolution/normalization
    (mico.py routes depth_pixels through forward_vision_encoder)."""

    def __init__(self, d_cfg: dict, model_cfg: dict, seed: Optional[int] = None):
        self.depth_dir = d_cfg["depth"]
        self.training = bool(d_cfg.get("training", True))
        self.sample_num = int(d_cfg.get("depth_sample_num", 1))
        self.resolution = int(model_cfg.get("vision_resolution", 224))
        self.mean, self.std = _stats_for(
            model_cfg.get("vision_encoder_type", "evaclip01_giant")
        )
        self._rng = random.Random(seed)

    def read(self, id_) -> Optional[np.ndarray]:
        try:
            maps = []
            for k in range(self.sample_num):
                cand = str(id_) if self.sample_num == 1 else f"{id_}_{k}"
                path = _resolve_path(
                    self.depth_dir, cand, IMAGE_EXT_FALLBACK + (".png",)
                )
                if path is None and self.sample_num > 1:
                    # fewer maps than requested: repeat the base map
                    path = _resolve_path(
                        self.depth_dir, id_, IMAGE_EXT_FALLBACK + (".png",)
                    )
                if path is None:
                    print("not have depth", id_)
                    return np.zeros(
                        (self.sample_num, 3, self.resolution, self.resolution),
                        np.float32,
                    )
                maps.append(load_image_chw(path))
            return _resize_normalize_host(
                np.stack(maps), self.resolution,
                tuple(self.mean), tuple(self.std),
            )
        except Exception as e:  # noqa: BLE001 — corrupt sample → resample
            print(e, id_)
            return None


class AudioMapper:
    """d_cfg keys: audio (root dir), training, audio_sample_num; model_cfg
    keys: audio_melbins, audio_target_length, audio_encoder_type."""

    ENCODER_STATS = {
        # audio_encoder_type → (mean, std)  (reference audio_mapper.py:19-26)
        "ast": (-4.2677393, 4.5689974),
        "beats": (15.41663, 6.55582),
    }

    def __init__(self, d_cfg: dict, model_cfg: dict, seed: Optional[int] = None):
        self.audio_dir = d_cfg["audio"]
        self.training = bool(d_cfg.get("training", True))
        self.sample_num = int(d_cfg["audio_sample_num"])
        self.melbins = int(model_cfg.get("audio_melbins", 64))
        self.target_length = int(model_cfg.get("audio_target_length", 1024))
        self.audio_encoder_type = model_cfg.get("audio_encoder_type", "beats")
        if self.audio_encoder_type not in self.ENCODER_STATS:
            raise NotImplementedError(self.audio_encoder_type)
        self.mean, self.std = self.ENCODER_STATS[self.audio_encoder_type]
        self._rng = random.Random(seed)

    def _fbank(self, path: str) -> np.ndarray:
        if self.audio_encoder_type == "ast":
            # native sample rate, mean-centered waveform, hanning window,
            # htk_compat has no output effect with use_energy=False
            # (reference audio_mapper.py:44-52)
            wave, sr = load_waveform(path, target_sr=0)
            wave = wave - wave.mean()
            cfg = FbankConfig(
                num_mel_bins=self.melbins,
                sample_frequency=float(sr),
                window_type="hanning",
            )
        else:  # beats: resample to 16 kHz, int16 scale, kaldi defaults
            wave, _ = load_waveform(path, target_sr=16000)
            wave = wave * 2.0**15
            cfg = FbankConfig(num_mel_bins=self.melbins)
        # numpy twin: loader threads must not dispatch device programs
        return kaldi_fbank_np(np.asarray(wave, np.float32), cfg)

    def read(self, id_) -> Optional[np.ndarray]:
        path = _resolve_path(self.audio_dir, id_, AUDIO_EXT_FALLBACK)
        if path is None:
            print("not have audios", id_)
            return np.zeros(
                (self.sample_num, self.target_length, self.melbins), np.float32
            )
        try:
            fb = self._fbank(path)
            fb = (fb - self.mean) / (self.std * 2)
            src = fb.shape[0]
            t = self.target_length
            pad_len = max(t * self.sample_num - src, t - src % t)
            fb = np.pad(fb, ((0, pad_len), (0, 0)))
            total = fb.shape[0] // t
            idx = sample_chunk_indices(total, self.sample_num, self.training, self._rng)
            return np.stack([fb[i * t : (i + 1) * t] for i in idx])
        except Exception as e:  # noqa: BLE001
            print(e)
            return None
