"""Data engine: mappers, annotation dataset, samplers, loaders, tar shards."""

import json
import os
import tarfile
import wave as wave_mod

import numpy as np
import pytest

from mico_tpu.data import (
    AnnoIndexedDataset,
    DataLoader,
    DevicePrefetcher,
    MetaLoader,
    ShardIndexedDataset,
    ShardedSampler,
    create_train_dataloaders,
    create_val_dataloaders,
)
from mico_tpu.data.mappers import AudioMapper, VisionMapper
from mico_tpu.utils.config_io import AttrDict

MODEL_CFG = {
    "vision_resolution": 64,
    "vision_encoder_type": "evaclip01_giant",
    "audio_melbins": 64,
    "audio_target_length": 32,
    "audio_encoder_type": "beats",
}


def _write_jpg(path, seed=0, hw=(48, 56)):
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(*hw, 3), dtype=np.uint8)
    cv2.imwrite(path, img)


def _write_wav(path, sr=16000, seconds=0.8, seed=0):
    rng = np.random.default_rng(seed)
    wav = (rng.standard_normal(int(sr * seconds)) * 0.1).clip(-1, 1)
    with wave_mod.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((wav * 32767).astype(np.int16).tobytes())


@pytest.fixture
def corpus(tmp_path):
    """Tiny annotation corpus: 6 images + wavs + captions (+1 corrupt image)."""
    img_dir = tmp_path / "images"
    wav_dir = tmp_path / "audio"
    img_dir.mkdir()
    wav_dir.mkdir()
    annos = []
    for i in range(6):
        _write_jpg(str(img_dir / f"s{i}.jpg"), seed=i)
        _write_wav(str(wav_dir / f"s{i}.wav"), seed=i)
        annos.append({"image_id": f"s{i}", "caption": f"a picture number {i}"})
    # corrupt image file
    (img_dir / "bad.jpg").write_bytes(b"not a jpeg")
    annos.append({"image_id": "bad", "caption": "broken sample"})
    txt = tmp_path / "annos.json"
    txt.write_text(json.dumps(annos))
    d_cfg = {
        "name": "tiny",
        "txt": str(txt),
        "vision": str(img_dir),
        "audio": str(wav_dir),
        "vision_format": "image_rawimage",
        "audio_sample_num": 2,
        "training": True,
    }
    return d_cfg


def test_vision_mapper_image(corpus):
    m = VisionMapper(corpus, MODEL_CFG, seed=0)
    out = m.read("s0")
    assert out.shape == (1, 3, 64, 64)
    # corrupt file → None (resample signal)
    assert m.read("bad") is None
    # missing file → zeros (reference vision_mapper.py:196-199)
    z = m.read("nonexistent")
    assert z.shape == (1, 3, 64, 64) and not z.any()


def test_vision_mapper_normalization(corpus, tmp_path):
    """Regression: the readers return [0,1] floats ALREADY (load_image_chw
    / read_frames_chw divide by 255 internally) — a second /255 in the
    mapper collapsed every pixel to ~-mean/std. A pure-white image must
    map to (1 - mean)/std per channel."""
    import cv2

    img_dir = tmp_path / "white"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "w.jpg"),
                np.full((64, 64, 3), 255, dtype=np.uint8))
    cfg = dict(corpus)
    cfg["vision"] = str(img_dir)
    m = VisionMapper(cfg, MODEL_CFG, seed=0)
    out = m.read("w")
    from mico_tpu.media.processors import _stats_for

    mean, std = _stats_for(MODEL_CFG["vision_encoder_type"])
    want = (1.0 - np.asarray(mean)) / np.asarray(std)
    got = out.mean(axis=(0, 2, 3))
    np.testing.assert_allclose(got, want, atol=0.05)


def test_audio_mapper_beats_and_ast(corpus):
    m = AudioMapper(corpus, MODEL_CFG, seed=0)
    out = m.read("s0")
    assert out.shape == (2, 32, 64)
    assert np.isfinite(out).all()
    # missing → zeros
    z = m.read("nonexistent")
    assert z.shape == (2, 32, 64) and not z.any()
    # ast settings run end-to-end too (native sample rate + hanning)
    ast = AudioMapper(corpus, {**MODEL_CFG, "audio_encoder_type": "ast"}, seed=0)
    out = ast.read("s1")
    assert out.shape == (2, 32, 64)
    assert np.isfinite(out).all()


def test_anno_dataset_resamples_corrupt_and_collates(corpus):
    ds = AnnoIndexedDataset(corpus, MODEL_CFG, seed=0)
    assert len(ds) == 7
    bad_i = next(i for i, a in enumerate(ds.annos) if a["image_id"] == "bad")
    sample = ds[bad_i]  # must transparently resample, not crash
    assert sample[2] is not None and sample[2].shape == (1, 3, 64, 64)

    batch = ds.collate_fn([ds[0], ds[1]])
    assert batch["vision_pixels"].shape == (2, 1, 3, 64, 64)
    assert batch["audio_spectrograms"].shape == (2, 2, 32, 64)
    assert batch["raw_captions"] == ["a picture number 0", "a picture number 1"]
    assert batch["ids"] == ["s0", "s1"]
    assert batch["ids_txt"] == [["s0"], ["s1"]]


def test_anno_dataset_depth_modality(corpus, tmp_path):
    """Depth maps load through DepthMapper into batch['depth_pixels'] so the
    omni tid/tvad mixes can train from disk (the reference consumes depth
    only at the model level, model/mico.py:145-148 — no reference loader)."""
    import cv2

    depth_dir = tmp_path / "depth"
    depth_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        # grayscale depth maps; cv2 loads them back as 3-channel
        cv2.imwrite(str(depth_dir / f"s{i}.png"),
                    rng.integers(0, 255, (40, 44), dtype=np.uint8))
    d_cfg = {**corpus, "depth": str(depth_dir)}
    ds = AnnoIndexedDataset(d_cfg, MODEL_CFG, seed=0)
    batch = ds.collate_fn([ds[0], ds[1]])
    assert batch["depth_pixels"].shape == (2, 1, 3, 64, 64)
    assert batch["vision_pixels"].shape == (2, 1, 3, 64, 64)
    # grayscale replicate: the 3 channels agree up to per-channel norm stats
    dp = batch["depth_pixels"]
    m, s = np.zeros(3), np.ones(3)
    from mico_tpu.media.processors import _stats_for

    m, s = map(np.asarray, _stats_for("evaclip01_giant"))
    un = dp * s.reshape(1, 1, 3, 1, 1) + m.reshape(1, 1, 3, 1, 1)
    np.testing.assert_allclose(un[:, :, 0], un[:, :, 1], atol=1e-5)
    # missing depth file → zeros (shape-stable), not a crash
    (depth_dir / "s1.png").unlink()
    ds2 = AnnoIndexedDataset(d_cfg, MODEL_CFG, seed=0)
    s1 = ds2[1]
    zeros = s1[9]
    assert zeros.shape == (1, 3, 64, 64) and not zeros.any()


def test_sharded_sampler_padding_and_wopadding():
    # padded (train): every shard same length, union covers all w/ wraparound
    shards = [
        list(ShardedSampler(10, 4, i, shuffle=False, pad=True)) for i in range(4)
    ]
    assert all(len(s) == 3 for s in shards)
    assert set(sum(shards, [])) == set(range(10))
    # no padding (eval): no duplicates, exact cover
    shards = [
        list(ShardedSampler(10, 4, i, shuffle=False, pad=False)) for i in range(4)
    ]
    flat = sum(shards, [])
    assert sorted(flat) == list(range(10))
    assert [len(s) for s in shards] == [3, 3, 2, 2]
    # shuffle is epoch-deterministic
    a = list(ShardedSampler(10, 2, 0, shuffle=True, seed=1))
    b = list(ShardedSampler(10, 2, 0, shuffle=True, seed=1))
    assert a == b


def test_dataloader_batching(corpus):
    ds = AnnoIndexedDataset(corpus, MODEL_CFG, seed=0)
    sampler = ShardedSampler(len(ds), 1, 0, shuffle=False, pad=False)
    loader = DataLoader(ds, sampler=sampler, batch_size=3, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3  # 7 samples → 3,3,1
    assert batches[0]["vision_pixels"].shape[0] == 3
    assert batches[-1]["vision_pixels"].shape[0] == 1


def test_metaloader_deterministic_weighted_sampling():
    def fake_loader(tag, n=4):
        return [({"x": np.full((1,), i)}) for i in range(n)]

    loaders = {"cap--a": (fake_loader("a"), 3), "ret--b": (fake_loader("b"), 1)}
    seq1 = [t for t, _ in zip((t for t, _ in MetaLoader(loaders, seed=7)), range(40))]
    loaders2 = {"cap--a": (fake_loader("a"), 3), "ret--b": (fake_loader("b"), 1)}
    seq2 = [t for t, _ in zip((t for t, _ in MetaLoader(loaders2, seed=7)), range(40))]
    # identical seeds → identical task sequence on every host (replaces
    # the reference's NCCL any_broadcast of rank-0's choice)
    assert seq1 == seq2
    # ratio-weighted: cap--a drawn roughly 3x as often
    assert seq1.count("cap--a") > seq1.count("ret--b")
    # accum window holds the task fixed
    m = MetaLoader(
        {"cap--a": (fake_loader("a"), 1), "ret--b": (fake_loader("b"), 1)},
        accum_steps=4,
        seed=3,
    )
    tasks = [t for t, _ in zip((t for t, _ in m), range(16))]
    for w in range(4):
        assert len(set(tasks[4 * w : 4 * w + 4])) == 1


def test_device_prefetcher_puts_arrays(corpus):
    import jax

    ds = AnnoIndexedDataset(corpus, MODEL_CFG, seed=0)
    loader = DataLoader(ds, batch_size=2, num_workers=1)
    for batch in DevicePrefetcher(loader):
        assert isinstance(batch["vision_pixels"], jax.Array)
        assert isinstance(batch["raw_captions"], list)
        break


def test_shard_dataset_roundtrip(tmp_path):
    import cv2

    tar_path = tmp_path / "shard-000.tar"
    with tarfile.open(tar_path, "w") as tf:
        for i in range(5):
            img = np.random.default_rng(i).integers(
                0, 255, size=(40, 40, 3), dtype=np.uint8
            )
            ok, enc = cv2.imencode(".jpg", img)
            assert ok
            for suffix, payload in (
                ("jpg", enc.tobytes()),
                ("txt", f"caption {i}".encode()),
            ):
                info = tarfile.TarInfo(f"sample{i}.{suffix}")
                info.size = len(payload)
                import io as _io

                tf.addfile(info, _io.BytesIO(payload))

    d_cfg = {
        "name": "tinyshards",
        "vision": str(tar_path),
        "vision_format": "image",
        "txt_format": None,
        "training": True,
        "shuffle_buffer": 4,
    }
    ds = ShardIndexedDataset(d_cfg, MODEL_CFG, seed=0)
    it = iter(ds)
    seen = set()
    for _ in range(8):  # resampled → stream loops past one shard's 5 samples
        pixels, caption, id_ = next(it)
        assert pixels.shape == (1, 3, 64, 64)
        assert caption.startswith("caption ")
        seen.add(id_)
    assert len(seen) == 5
    loader = DataLoader(ds, batch_size=4, num_workers=1)
    batch = next(iter(loader))
    assert batch["vision_pixels"].shape == (4, 1, 3, 64, 64)
    assert len(batch["raw_captions"]) == 4


def test_builders_end_to_end(corpus, tmp_path):
    args = AttrDict.deep(
        {
            "run_cfg": {
                "gradient_accumulation_steps": 1,
                "seed": 0,
                "num_train_steps": 0,
                "valid_freq": 2,
            },
            "model_cfg": MODEL_CFG,
            "data_cfg": {
                "train": [
                    {
                        **corpus,
                        "type": "annoindexed",
                        "task": "ret%tva_cap%tva",
                        "batch_size": 2,
                        "n_workers": 2,
                        "steps": 6,
                    }
                ],
                "val": [
                    {
                        **corpus,
                        "type": "annoindexed",
                        "task": "ret%tva",
                        "batch_size": 2,
                        "n_workers": 2,
                    }
                ],
            },
        }
    )
    meta = create_train_dataloaders(args)
    assert args.run_cfg.num_train_steps == 6
    assert args.run_cfg.valid_steps == 2
    tasks = []
    for (task, batch), _ in zip(iter(meta), range(4)):
        tasks.append(task)
        assert batch["vision_pixels"].shape[0] == 2
    assert all(t == "ret%tva_cap%tva--tiny" for t in tasks)

    vals = create_val_dataloaders(args)
    (name, loader), = vals.items()
    assert name == "ret%tva--tiny"
    n = sum(b["vision_pixels"].shape[0] for b in loader)
    assert n == 7  # no-padding eval: every sample exactly once
