from mico_tpu.parallel.mesh import create_mesh, data_parallel_mesh
from mico_tpu.parallel.collectives import (
    all_gather_concat,
    all_gather_no_grad,
    data_axis_index,
    data_axis_size,
)
from mico_tpu.parallel.partition import mico_param_specs, batch_spec
