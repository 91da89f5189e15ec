"""Cross-architecture IL coverage: the Attn head through MRN's expert
stacking (per-expert class_count clamping) and the SVTR backbone (droppath
rngs through nn.vmap) through DER."""

import numpy as np
import pytest

from helpers import make_source, run_tasks, tiny_opt

pytestmark = pytest.mark.slow


def test_mrn_with_attn_decoder(tmp_path):
    from mrn_tpu.train.learners.mrn import MRN
    opt = tiny_opt(il="mrn", memory="random", memory_num=8, num_iter=3,
                   val_interval=3, lan_list=["T0", "T1"], batch_max_length=6,
                   Transformation="None", FeatureExtraction="VGG",
                   SequenceModeling="None", Prediction="Attn",
                   output_dir=str(tmp_path / "s"), data_log=str(tmp_path / "d.txt"))
    source = make_source(opt)
    learner = MRN(opt)
    best, _ = run_tasks(learner, opt, source, 2, tmp_path)
    assert len(learner.expert_params) == 2
    # per-expert embedding tables exist at their creation-time class counts
    c0, c1 = learner.class_counts
    assert c0 < c1
    assert learner.expert_params[0]["prediction"]["char_embeddings"].shape[0] == c0


def test_mrn_with_trba(tmp_path):
    """Full TRBA (TPS + ResNet + BiLSTM + Attn) through MRN expert stacking:
    grid-sample inside nn.vmap, per-expert fiducial localization nets."""
    from mrn_tpu.train.learners.mrn import MRN
    opt = tiny_opt(il="mrn", memory="random", memory_num=8, num_iter=3,
                   val_interval=3, lan_list=["T0", "T1"], batch_max_length=6,
                   Transformation="TPS", FeatureExtraction="ResNet",
                   SequenceModeling="BiLSTM", Prediction="Attn",
                   output_dir=str(tmp_path / "s"), data_log=str(tmp_path / "d.txt"))
    source = make_source(opt)
    learner = MRN(opt)
    best, _ = run_tasks(learner, opt, source, 2, tmp_path)
    assert len(learner.expert_params) == 2
    assert len(best) == 2 and all(np.isfinite(best))
    # each stacked expert carries its own TPS localization net (the TPS
    # module lives inside the extractor scope, composer.py:58-60)
    assert "transformation" in learner.expert_params[0]["extractor"]


def test_der_with_svtr_backbone(tmp_path):
    from mrn_tpu.train.learners.der import DER
    opt = tiny_opt(il="der", memory="random", memory_num=8, num_iter=3,
                   val_interval=3, lan_list=["T0", "T1"],
                   Transformation="None", FeatureExtraction="SVTR",
                   SequenceModeling="None", Prediction="CTC",
                   output_dir=str(tmp_path / "s"), data_log=str(tmp_path / "d.txt"))
    source = make_source(opt)
    learner = DER(opt)
    best, _ = run_tasks(learner, opt, source, 2, tmp_path)
    assert learner.n_experts == 2
    assert len(best) == 2


def test_der_with_rcnn_backbone(tmp_path):
    """GRCNN (RCNN/GRCL) through DER's vmapped extractor stack: the 5-step
    gated recurrence with per-step BNs under nn.vmap."""
    from mrn_tpu.train.learners.der import DER
    opt = tiny_opt(il="der", memory="random", memory_num=8, num_iter=3,
                   val_interval=3, lan_list=["T0", "T1"],
                   Transformation="None", FeatureExtraction="RCNN",
                   SequenceModeling="BiLSTM", Prediction="CTC",
                   output_dir=str(tmp_path / "s"), data_log=str(tmp_path / "d.txt"))
    source = make_source(opt)
    learner = DER(opt)
    best, _ = run_tasks(learner, opt, source, 2, tmp_path)
    assert learner.n_experts == 2
    assert len(best) == 2
