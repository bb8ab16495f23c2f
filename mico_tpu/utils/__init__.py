from mico_tpu.utils.logger import LOGGER, RunningMeter, add_log_to_file
from mico_tpu.utils.config_io import (
    load_layered_config,
    dump_hps,
    load_hps,
)
