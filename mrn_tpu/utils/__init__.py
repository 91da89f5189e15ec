from mrn_tpu.utils.averager import Averager
from mrn_tpu.utils.logging import ExperimentLog

__all__ = ["Averager", "ExperimentLog"]
