"""Media processors: decode + preprocessing parity and contracts."""

import math
import os
import wave as wave_mod

import numpy as np
import pytest

from mico_tpu.media import (
    AudioProcessor,
    ImageProcessor,
    VideoProcessor,
    sample_chunk_indices,
    split_chunks,
)
from mico_tpu.media.audio_io import load_waveform, load_wav_stdlib

EXAMPLES = "/root/reference/example"


def test_chunk_split_matches_reference_formula():
    # reference split(): k,m = divmod(n, s); contiguous chunks
    assert split_chunks(list(range(10)), 4) == [[0, 1, 2], [3, 4, 5], [6, 7], [8, 9]]
    # padding with last element when n < sample_num
    assert split_chunks([0, 1], 4) == [[0], [1], [1], [1]]
    # eval picks chunk[(len+1)//2 - 1]
    assert sample_chunk_indices(10, 4, training=False) == [1, 4, 6, 8]
    assert sample_chunk_indices(360, 4, training=False)[0] == 44


def test_image_processor_shapes_and_values():
    proc = ImageProcessor(224, "evaclip01_giant", training=False)
    out = proc(os.path.join(EXAMPLES, "test.jpeg"))
    assert out.shape == (1, 3, 224, 224)
    # normalized with CLIP stats: de-normalize must land in [0, 1]
    mean = np.asarray([0.48145466, 0.4578275, 0.40821073]).reshape(1, 3, 1, 1)
    std = np.asarray([0.26862954, 0.26130258, 0.27577711]).reshape(1, 3, 1, 1)
    img = out * std + mean
    assert img.min() > -1e-3 and img.max() < 1 + 1e-3


def test_video_processor_eval_deterministic():
    proc = VideoProcessor(
        224, "evaclip01_giant", sample_num=4, data_format="raw", training=False
    )
    out1 = proc(os.path.join(EXAMPLES, "test.mp4"))
    out2 = proc(os.path.join(EXAMPLES, "test.mp4"))
    assert out1.shape == (4, 3, 224, 224)
    np.testing.assert_array_equal(out1, out2)


def _write_wav(path, wave, sr):
    with wave_mod.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((wave * 32767).astype(np.int16).tobytes())


def test_native_audio_decoder_matches_stdlib(tmp_path):
    t = np.arange(16000) / 16000
    sig = (0.5 * np.sin(2 * math.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    _write_wav(p, sig, 16000)
    ours, src_sr = load_waveform(p, target_sr=16000)
    ref, sr = load_wav_stdlib(p)
    assert src_sr == sr == 16000
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_native_audio_decoder_resamples(tmp_path):
    t = np.arange(8000) / 8000
    sig = (0.5 * np.sin(2 * math.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "t8k.wav")
    _write_wav(p, sig, 8000)
    out, src_sr = load_waveform(p, target_sr=16000)
    assert src_sr == 8000
    assert abs(out.shape[0] - 16000) < 64
    # 440 Hz tone survives resampling: dominant FFT bin ≈ 440
    spec = np.abs(np.fft.rfft(out[:16000]))
    assert abs(np.argmax(spec) - 440) <= 1


def test_audio_processor_on_flac():
    proc = AudioProcessor(
        melbins=224, target_length=224, sample_num=4, training=False
    )
    out = proc(os.path.join(EXAMPLES, "test.flac"))
    assert out.shape == (4, 224, 224)
    assert np.isfinite(out).all()
    # deterministic at eval
    out2 = proc(os.path.join(EXAMPLES, "test.flac"))
    np.testing.assert_array_equal(out, out2)


def test_audio_processor_missing_file_returns_zeros():
    proc = AudioProcessor(melbins=64, target_length=128, sample_num=2)
    out = proc("/nonexistent/a.wav")
    assert out.shape == (2, 128, 64)
    assert (out == 0).all()


def test_native_video_decoder(tmp_path):
    """C++ libav batched frame gather (csrc/video_decode.cpp) matches the
    cv2 fallback exactly, including out-of-order and duplicate indices."""
    import cv2

    from mico_tpu.media.video_io import (
        _lib,
        _read_frames_cv2,
        read_frames_chw,
        video_num_frames,
    )

    path = str(tmp_path / "clip.mp4")
    w, h, n = 64, 48, 25
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    for i in range(n):
        f = np.full((h, w, 3), (i * 9) % 256, np.uint8)
        f[:8, :8] = [250, 10, 10]
        vw.write(f)
    vw.release()

    if _lib() is None:
        pytest.skip("native media lib unavailable")
    assert video_num_frames(path) == n
    idx = [3, 0, 24, 11, 11, 7]
    nat = read_frames_chw(path, idx)
    ref = _read_frames_cv2(path, idx)
    assert nat.shape == (6, 3, h, w)
    np.testing.assert_allclose(nat, ref, atol=0.05)


def test_host_twins_match_device_ops():
    """The numpy host twins (loader threads must not dispatch per-item
    device programs) match the jitted device ops they mirror."""
    from mico_tpu.media.processors import (
        _resize_normalize,
        _resize_normalize_host,
        _wave_to_fbank,
        _wave_to_fbank_host,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    frames = rng.random((2, 3, 37, 53)).astype(np.float32)
    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)
    dev = np.asarray(_resize_normalize(jnp.asarray(frames), 24, mean, std))
    host = _resize_normalize_host(frames, 24, mean, std)
    np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)

    wave = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    dev = np.asarray(_wave_to_fbank(jnp.asarray(wave), 64, 48, 15.41663, 6.55582))
    host = _wave_to_fbank_host(wave, 64, 48, 15.41663, 6.55582)
    np.testing.assert_allclose(host, dev, rtol=2e-4, atol=2e-4)
