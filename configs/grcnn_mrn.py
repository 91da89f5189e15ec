"""GRCNN_MRN config — same public surface as the reference's
config/crnn_mrn.py (with the RCNN/GRCL backbone swapped in) (mmcv-free; loaded by mrn_tpu.config.load_config)."""

common = dict(
    exp_name="GRCNN_MRN",
    il="mrn",                 # joint_mix | joint_loader | base | lwf | wa | ewc | der | mrn
    memory="random",           # None | "random"
    memory_num=2000,
    batch_max_length=25,
    imgH=32,
    imgW=256,
    manual_seed=111,
    start_task=0,
)

model = dict(
    model_name="GRCNN",
    Transformation="None",        # None | TPS
    FeatureExtraction="RCNN",     # VGG | RCNN | ResNet | SVTR
    SequenceModeling="BiLSTM",        # None | BiLSTM
    Prediction="CTC",             # CTC | Attn
    num_fiducial=20,
    input_channel=4,
    output_channel=512,
    hidden_size=256,
)

optimizer = dict(
    schedule="super",   # "super" = OneCycle; list of fractions = milestone decay
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
    Aug="None",         # None | Blur | Crop | Rot | ABINet
    workers=4,
    lan_list=["Chinese", "Latin", "Japanese", "Korean", "Arabic", "Bangla"],
    valid_datas=[
        "../dataset/MLT17_IL/test_2017",
        "../dataset/MLT19_IL/test_2019",
    ],
    select_data=[
        "../dataset/MLT17_IL/train_2017",
        "../dataset/MLT19_IL/train_2019",
    ],
    batch_ratio="0.5-0.5",
    total_data_usage_ratio="1.0",
    NED=True,
    batch_size=256,
    num_iter=10000,
    val_interval=5000,
    log_multiple_test=None,
    grad_clip=5,
)
