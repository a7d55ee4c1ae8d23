from moca_tpu.sampling.ddim import ddim_sample, stochastic_encode  # noqa: F401
from moca_tpu.sampling.moca import MoCAConfig, moca_window_step  # noqa: F401
from moca_tpu.sampling.fifo import (  # noqa: F401
    FIFOPlan, make_fifo_plan, prepare_queue, fifo_step, shift_queue,
)
