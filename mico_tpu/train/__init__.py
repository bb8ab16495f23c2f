from mico_tpu.train.masker import mask_tokens
from mico_tpu.train.sched import lr_schedule_ratio
from mico_tpu.train.optim import build_optimizer, OptimConfig
from mico_tpu.train import objectives
