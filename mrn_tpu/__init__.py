"""mrn_tpu — a TPU-native (JAX/XLA/Pallas) framework for Incremental Multilingual
Text Recognition (IMLTR), providing the full capability surface of the MRN
reference toolkit (ICCV 2023, "MRN: Multiplexed Routing Network for Incremental
Multilingual Text Recognition"):

- three recognizer architectures built from a 4-stage pipeline
  (Transformation -> FeatureExtraction -> SequenceModeling -> Prediction):
  CRNN (None+VGG+BiLSTM+CTC), TRBA (TPS+ResNet+BiLSTM+Attn),
  SVTR (None+SVTR+None+CTC);
- seven incremental-learning strategies: base, joint (mix/loader), EWC, LwF,
  WA, DER, MRN (the paper's multiplexed-routing method);
- an LMDB crop data pipeline with per-task character dictionaries, rehearsal
  memory and balanced batch composition;
- a word-accuracy + normalized-edit-distance evaluation harness.

Design: everything on the hot path is a jitted, statically-shaped JAX program
(scan-based recurrence, MXU-friendly matmul formulations, batch data
parallelism via jax.sharding over a device Mesh).  Incremental-learning
orchestration (classifier growth, expert stacking, rehearsal bookkeeping) runs
between jit regions as explicit pytree surgery.
"""

__version__ = "0.1.0"
