"""Dataloader builders from the layered config.

Capability parity with the reference builders
(data/utils/build_dataloader.py:11-126):

  - per-dataset config entries (name, type, task, batch_size, n_workers,
    steps|epoch) from `data_cfg.train` / `data_cfg.val`.
  - global batch divided by world size (here: number of JAX processes —
    each host loads its per-host slice; devices get theirs via the batch
    sharding at device_put time).
  - train: shuffled padded sharding, drop_last; val: no-padding sharding so
    no eval sample is duplicated.
  - MetaLoader step-ratio weighting = the dataset's train_steps; total
    num_train_steps defaulted to the sum; valid_steps derived as
    num_train_steps // valid_freq - 1.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax

from mico_tpu.data.loader import DataLoader, DevicePrefetcher, MetaLoader
from mico_tpu.data.sampler import ShardedSampler
from mico_tpu.utils.logger import LOGGER


def _registry():
    from mico_tpu.data import data_registry

    return data_registry


def _world():
    try:
        return jax.process_count(), jax.process_index()
    except RuntimeError:
        return 1, 0


def build_dataloader(
    dataset,
    is_train: bool,
    batch_size: int,
    n_workers: int = 4,
    use_sampler: bool = True,
    seed: int = 0,
) -> DataLoader:
    num_shards, shard_id = _world()
    per_host_bs = max(1, batch_size // num_shards)
    sampler = None
    if use_sampler and getattr(dataset, "use_sampler", True):
        sampler = ShardedSampler(
            len(dataset),
            num_shards=num_shards,
            shard_id=shard_id,
            shuffle=is_train,
            pad=is_train,
            seed=seed,
        )
    return DataLoader(
        dataset,
        sampler=sampler,
        batch_size=per_host_bs,
        num_workers=n_workers or 4,
        drop_last=is_train,
    )


def create_train_dataloaders(args, sharding=None) -> Optional[DevicePrefetcher]:
    data_cfg = args.data_cfg.get("train", [])
    if not data_cfg:
        return None
    run_cfg = args.run_cfg
    accum = int(run_cfg.get("gradient_accumulation_steps", 1))
    seed = int(run_cfg.get("seed", 0))
    loaders: Dict = {}
    train_steps = []
    for d_cfg in data_cfg:
        name = d_cfg["name"]
        dataset = _registry()[d_cfg.get("type", "annoindexed")](
            d_cfg, args.model_cfg, seed=seed
        )
        LOGGER.info("Create Dataset %s Success", name)
        batch_size = int(d_cfg["batch_size"])
        if "steps" in d_cfg:
            steps = int(d_cfg["steps"])
        else:
            steps = int((len(dataset) // batch_size) * d_cfg.get("epoch", 1))
        train_steps.append(steps)
        loader = build_dataloader(
            dataset,
            True,
            batch_size // accum,
            d_cfg.get("n_workers", 4),
            seed=seed,
        )
        loaders[f"{d_cfg['task']}--{name}"] = (loader, steps)
        LOGGER.info(
            "loader %s, ratio %d, bs_perhost %d", name, steps, loader.batch_size
        )

    meta = MetaLoader(loaders, accum_steps=accum, seed=seed)
    if int(run_cfg.get("num_train_steps", 0)) == 0:
        run_cfg["num_train_steps"] = sum(train_steps)
    run_cfg["valid_steps"] = max(
        1, run_cfg["num_train_steps"] // int(run_cfg.get("valid_freq", 10)) - 1
    )
    out = DevicePrefetcher(meta, sharding=sharding)
    out.ndata = len(loaders)
    return out


def create_val_dataloaders(args, sharding=None) -> Dict[str, DevicePrefetcher]:
    data_cfg = args.data_cfg.get("val", [])
    seed = int(args.run_cfg.get("seed", 0))
    out: Dict[str, DevicePrefetcher] = {}
    for d_cfg in data_cfg:
        name = d_cfg["name"]
        d_cfg = dict(d_cfg)
        d_cfg.setdefault("training", False)
        dataset = _registry()[d_cfg.get("type", "annoindexed")](
            d_cfg, args.model_cfg, seed=seed
        )
        dataset.name = name
        LOGGER.info("Create Dataset %s Success", name)
        loader = build_dataloader(
            dataset,
            False,
            int(d_cfg["batch_size"]),
            d_cfg.get("n_workers", 4),
            seed=seed,
        )
        out[f"{d_cfg['task']}--{name}"] = DevicePrefetcher(loader, sharding=sharding)
    return out
