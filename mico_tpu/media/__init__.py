from mico_tpu.media.processors import (
    AudioProcessor,
    ImageProcessor,
    VideoProcessor,
    CLIP_MEAN,
    CLIP_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from mico_tpu.media.chunking import sample_chunk_indices, split_chunks
