from mrn_tpu.ops.ctc import ctc_loss
from mrn_tpu.ops.losses import cross_entropy_ignore, kd_loss
from mrn_tpu.ops.grid_sample import grid_sample
from mrn_tpu.ops.schedules import onecycle_schedule, multistep_schedule
from mrn_tpu.ops.metrics import edit_distance, ned_score

__all__ = [
    "ctc_loss",
    "cross_entropy_ignore",
    "kd_loss",
    "grid_sample",
    "onecycle_schedule",
    "multistep_schedule",
    "edit_distance",
    "ned_score",
]
