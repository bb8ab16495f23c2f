from mico_tpu.ops.layers import layer_norm, gelu, linear
from mico_tpu.ops.interpolate import (
    interp_nearest_1d,
    interp_bilinear_2d,
    resize_bilinear_no_antialias,
)
from mico_tpu.ops.attention import multi_head_attention
from mico_tpu.ops.fbank import kaldi_fbank, FbankConfig
