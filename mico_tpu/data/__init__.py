"""Data engine: annotation datasets, shard streams, samplers, loaders.

TPU-native re-design of the reference data half (reference: data/data/*):
decode on host worker threads, fixed-shape numpy batches, double-buffered
async `jax.device_put` instead of CUDA-stream prefetch, and seeded
deterministic task sampling instead of NCCL `any_broadcast`.
"""

from mico_tpu.data.anno_dataset import AnnoIndexedDataset, anno_collate
from mico_tpu.data.build import (
    create_train_dataloaders,
    create_val_dataloaders,
)
from mico_tpu.data.loader import DataLoader, DevicePrefetcher, MetaLoader
from mico_tpu.data.mappers import AudioMapper, VisionMapper
from mico_tpu.data.sampler import ShardedSampler
from mico_tpu.data.shards import ShardIndexedDataset

# data_registry (reference: data/data/__init__.py:1-9)
data_registry = {
    "annoindexed": AnnoIndexedDataset,
    "srcindexed": ShardIndexedDataset,
}

__all__ = [
    "AnnoIndexedDataset",
    "AudioMapper",
    "DataLoader",
    "DevicePrefetcher",
    "MetaLoader",
    "ShardIndexedDataset",
    "ShardedSampler",
    "VisionMapper",
    "anno_collate",
    "create_train_dataloaders",
    "create_val_dataloaders",
    "data_registry",
]
