"""JAX-side config matched 1:1 to oracle/run_reference.py's reduced-dim
settings (the system-level behavioral oracle, VERDICT r2 #3): same synthetic
LMDB trees, same model dims, same optimizer envelope, same seed.  Override
`il`, `lan_list`, `num_iter` from scripts/oracle_report.py via exec-time
environment variables ORACLE_IL / ORACLE_TASKS / ORACLE_ITER / ORACLE_TAG."""

import os

_IL = os.environ.get("ORACLE_IL", "base")
_TASKS = int(os.environ.get("ORACLE_TASKS", "3"))
_ITER = int(os.environ.get("ORACLE_ITER", "300"))
_TAG = os.environ.get("ORACLE_TAG", "r300")
# "data" = disjoint-alphabet suite; "data_shared" = the overlap suite
# (scripts/export_oracle_lmdb --shared 30), matching run_reference --data_root.
_DATA = os.environ.get("ORACLE_DATA", "data")
_HERE = os.path.dirname(os.path.abspath(__file__))

common = dict(
    exp_name=f"jax_{_IL}_{_TAG}",
    il=_IL,
    memory="random" if _IL in ("mrn", "der", "wa") else None,
    memory_num=int(os.environ.get("ORACLE_MEMORY", "600")),
    # matches run_reference.py's scaled reference Fisher budget (num_iter//4)
    fisher_num_iter=max(1, _ITER // 4),
    batch_max_length=25,
    imgH=32,
    imgW=256,
    manual_seed=111,
    start_task=int(os.environ.get("ORACLE_START", "0")),
    # ORACLE_PIN=0 runs the reference-faithful mode (frozen experts' BN
    # running stats drift during router training, il_modules/mrn.py:401);
    # default 1 = the rebuild's pin-stats fix.  Used by the r1500 MRN pair
    # to attribute the divergence (VERDICT r3 missing #2).
    mrn_pin_expert_stats=os.environ.get("ORACLE_PIN", "1") == "1",
)

model = dict(
    model_name="CRNN",
    Transformation="None",
    FeatureExtraction="VGG",
    SequenceModeling="BiLSTM",
    Prediction="CTC",
    num_fiducial=20,
    input_channel=4,
    output_channel=128,
    hidden_size=64,
)

optimizer = dict(
    schedule="super",
    optimizer="adam",
    lr=0.0005,
    sgd_momentum=0.9,
    sgd_weight_decay=0.000001,
    milestones=[2000, 4000],
    lrate_decay=0.1,
    rho=0.95,
    eps=1e-8,
    lr_drop_rate=0.1,
)

train = dict(
    saved_model="",
    Aug="None",
    workers=0,
    lan_list=["Chinese", "Latin", "Japanese", "Korean", "Arabic",
              "Bangla"][:_TASKS],
    valid_datas=[os.path.join(_HERE, _DATA, "synth_test")],
    select_data=[os.path.join(_HERE, _DATA, "synth_train")],
    batch_ratio="0.5-0.5",
    total_data_usage_ratio="1.0",
    NED=True,
    batch_size=32,
    num_iter=_ITER,
    val_interval=max(1, _ITER // 2),
    log_multiple_test=None,
    grad_clip=5,
    output_dir=os.path.join(_HERE, "runs", f"jax_{_IL}_{_TAG}", "saved_models"),
    data_log=os.path.join(_HERE, "runs", f"jax_{_IL}_{_TAG}", "data_any.txt"),
)
