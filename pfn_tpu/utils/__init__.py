"""Shared utilities: LR schedules, eval-position samplers, misc."""

from pfn_tpu.utils.schedules import (
    cosine_schedule_with_warmup,
    linear_schedule_with_warmup,
    get_openai_lr,
)
from pfn_tpu.utils.samplers import (
    weighted_single_eval_pos,
    uniform_single_eval_pos,
    make_eval_pos_weights,
)
from pfn_tpu.utils.profiling import (
    StepTimers,
    debug_nans,
    pfn_debug_checks,
    trace,
)

__all__ = [
    "StepTimers",
    "debug_nans",
    "pfn_debug_checks",
    "trace",
    "cosine_schedule_with_warmup",
    "linear_schedule_with_warmup",
    "get_openai_lr",
    "weighted_single_eval_pos",
    "uniform_single_eval_pos",
    "make_eval_pos_weights",
]
