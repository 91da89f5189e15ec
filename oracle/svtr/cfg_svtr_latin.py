# SVTR (None+SVTR+None+CTC, full dims) single-task train on the exported
# synthetic Latin LMDB — produces the checkpoint for the SVTR int8
# accuracy-delta measurement (evaluate_cli --int8 vs f32; the w8a8 block
# projections, mrn_tpu/ops/int8.py), mirroring oracle/trba/cfg_trba_latin.py.
import os
_HERE = os.path.dirname(os.path.abspath(__file__))
_DATA = os.path.join(_HERE, "..", "data")

common = dict(exp_name="svtr_latin", il="base", batch_max_length=25,
              imgH=32, imgW=256, manual_seed=111)
model = dict(model_name="SVTR", Transformation="None",
             FeatureExtraction="SVTR", SequenceModeling="None",
             Prediction="CTC", num_fiducial=20, input_channel=4,
             output_channel=512, hidden_size=256)
optimizer = dict(schedule="super", optimizer="adam", lr=0.0005,
                 sgd_momentum=0.9, sgd_weight_decay=0.000001,
                 milestones=[2000, 4000], lrate_decay=0.1, rho=0.95,
                 eps=1e-8, lr_drop_rate=0.1)
train = dict(saved_model="", Aug="None", workers=0,
             lan_list=["Latin"],
             valid_datas=[os.path.join(_DATA, "synth_test")],
             select_data=[os.path.join(_DATA, "synth_train")],
             batch_ratio="0.5", total_data_usage_ratio="1.0", NED=True,
             batch_size=128, num_iter=1200, val_interval=600,
             grad_clip=5,
             output_dir=os.path.join(_HERE, "saved_models"),
             data_log=os.path.join(_HERE, "data_any.txt"))
