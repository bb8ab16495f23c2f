"""Kaldi fbank parity vs an independent float64 NumPy transcription of the
Kaldi/torchaudio algorithm (torchaudio itself is not installed in this image;
this golden follows torchaudio.compliance.kaldi.fbank's documented defaults:
dither=0, remove_dc_offset, preemphasis .97, povey window, snip_edges,
round_to_power_of_two, power spectrum, log mel)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from mico_tpu.ops import FbankConfig, kaldi_fbank
from mico_tpu.ops.fbank import num_frames


def golden_fbank(wave: np.ndarray, num_mel_bins: int, sf: float = 16000.0):
    ws = int(sf * 0.025)
    shift = int(sf * 0.010)
    padded = 512
    n = wave.shape[0]
    m = 1 + (n - ws) // shift
    frames = np.stack([wave[i * shift : i * shift + ws] for i in range(m)]).astype(
        np.float64
    )
    frames -= frames.mean(axis=1, keepdims=True)
    prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames -= 0.97 * prev
    i = np.arange(ws)
    window = (0.5 - 0.5 * np.cos(2 * math.pi * i / (ws - 1))) ** 0.85
    frames *= window
    frames = np.pad(frames, ((0, 0), (0, padded - ws)))
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (m, 257)

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    low, high = mel(20.0), mel(8000.0)
    delta = (high - low) / (num_mel_bins + 1)
    centers = low + delta * (np.arange(num_mel_bins) + 1)
    lefts, rights = centers - delta, centers + delta
    fft_freqs = mel(np.arange(256) * sf / padded)
    up = (fft_freqs[None] - lefts[:, None]) / delta
    down = (rights[:, None] - fft_freqs[None]) / delta
    bank = np.maximum(0, np.minimum(up, down))  # (bins, 256)
    bank = np.concatenate([bank, np.zeros((num_mel_bins, 1))], axis=1)
    feats = spec @ bank.T
    return np.log(np.maximum(feats, np.finfo(np.float32).eps))


@pytest.mark.parametrize("bins", [64, 224])
def test_fbank_matches_kaldi_spec(rng, bins):
    # White noise: low mel bins have ~zero energy, so fp32 DFT cancellation
    # noise (present identically in torchaudio's fp32 pipeline) dominates the
    # log there. Compare in linear space relative to each frame's peak.
    wave = (rng.standard_normal(16000) * 0.1 * 2**15).astype(np.float32)
    cfg = FbankConfig(num_mel_bins=bins)
    got = np.asarray(kaldi_fbank(jnp.asarray(wave), cfg))
    want = golden_fbank(wave.astype(np.float64), bins)
    assert got.shape == want.shape == (98, bins)
    p_got, p_want = np.exp(got), np.exp(want)
    rel = np.abs(p_got - p_want) / p_want.max(axis=1, keepdims=True)
    assert rel.max() < 2e-4  # fp32-vs-fp64 accumulation noise


def test_fbank_log_parity_dense_spectrum(rng):
    # Harmonic-rich signal: every mel bin carries real energy, so the log-mel
    # values themselves must match tightly.
    t = np.arange(16000) / 16000.0
    wave = sum(
        np.sin(2 * np.pi * f * t + p)
        for f, p in [(55, 0.1), (220, 1.0), (880, 2.0), (3520, 0.3), (7040, 0.7)]
    )
    # noise floor keeps every bin's energy well above fp32 cancellation level
    wave = (wave * 3000 + np.random.default_rng(1).standard_normal(16000) * 300).astype(
        np.float32
    )
    got = np.asarray(kaldi_fbank(jnp.asarray(wave), FbankConfig(num_mel_bins=128)))
    want = golden_fbank(wave.astype(np.float64), 128)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_num_frames():
    cfg = FbankConfig()
    assert num_frames(400, cfg) == 1
    assert num_frames(399, cfg) == 0
    assert num_frames(16000, cfg) == 98
