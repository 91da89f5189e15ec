from mrn_tpu.train.learners.base import BaseLearner

__all__ = ["BaseLearner"]


def build_learner(opt):
    """Learner dispatch by opt.il (reference: tiny_train.py:216-229)."""
    il = opt.il
    if il == "lwf":
        from mrn_tpu.train.learners.lwf import LwF
        return LwF(opt)
    if il == "wa":
        from mrn_tpu.train.learners.wa import WA
        return WA(opt)
    if il == "ewc":
        from mrn_tpu.train.learners.ewc import EWC
        return EWC(opt)
    if il == "der":
        from mrn_tpu.train.learners.der import DER
        return DER(opt)
    if il == "mrn":
        from mrn_tpu.train.learners.mrn import MRN
        return MRN(opt)
    if il in ("joint_mix", "joint_loader"):
        from mrn_tpu.train.learners.joint import JointLearner
        return JointLearner(opt)
    return BaseLearner(opt)
