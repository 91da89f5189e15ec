"""Full-stack integration: synthetic crops -> native LMDB datasets on disk
(reference directory layout: <root>/<language>/{data.mdb,dict.txt}) ->
train.py task loop -> checkpoints + data_any.txt + final AIA."""

import io
import os
import sys

import numpy as np
import PIL.Image
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrn_tpu.config import default_options
from mrn_tpu.data.lmdb_store import LmdbWriter
from mrn_tpu.data.synthetic import make_task_dataset
from mrn_tpu.tools.create_lmdb import write_dict_txt
from mrn_tpu.utils.logging import ExperimentLog


def _build_lmdb_tree(root, lan, alphabet, n, seed, img_w):
    """Write <root>/<lan>/ as an LMDB dir + dict.txt."""
    path = os.path.join(root, lan)
    os.makedirs(path, exist_ok=True)
    ds = make_task_dataset(alphabet, n, img_w=img_w, seed=seed)
    w = LmdbWriter(path, map_size=1 << 24)
    w.put(b"num-samples", str(n).encode())
    lexicon = set()
    for i in range(n):
        img, label = ds[i]
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        w.put(b"image-%09d" % (i + 1), buf.getvalue())
        w.put(b"label-%09d" % (i + 1), label.encode())
        lexicon.update(label)
    w.commit()
    write_dict_txt(sorted(lexicon), os.path.join(path, "dict"))


@pytest.mark.parametrize("il", ["base", "mrn"])
@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path, il):
    import train as train_mod

    lans = ["T0", "T1"]
    alphabets = ["abc", "def"]
    train_root = str(tmp_path / "train_root")
    test_root = str(tmp_path / "test_root")
    for i, lan in enumerate(lans):
        _build_lmdb_tree(train_root, lan, alphabets[i], 24, seed=i, img_w=64)
        _build_lmdb_tree(test_root, lan, alphabets[i], 8, seed=10 + i, img_w=64)

    opt = default_options(
        exp_name=f"e2e_{il}", il=il,
        memory="random" if il == "mrn" else None, memory_num=8,
        imgW=64, output_channel=64, hidden_size=32, batch_size=8,
        num_iter=3, val_interval=3, batch_max_length=8,
        lan_list=lans, select_data=[train_root], valid_datas=[test_root],
        workers=0, output_dir=str(tmp_path / "saved"),
        data_log=str(tmp_path / "data_any.txt"))

    log = ExperimentLog(opt.exp_name, opt.output_dir, opt.data_log, echo=False)
    best, ned = train_mod.train(opt, log)
    assert len(best) == 2
    assert os.path.exists(opt.data_log)
    exp_dir = tmp_path / "saved" / opt.exp_name
    assert any(p.suffix == ".msgpack" for p in exp_dir.iterdir())
    content = (tmp_path / "data_any.txt").read_text(encoding="utf-8")
    assert "Avg Acc" in content or "Task" in content

    if il == "base":
        _check_evaluate_cli(tmp_path, opt, train_root, test_root)
        _check_benchmark_all_eval(tmp_path, opt, test_root)
        _check_recognize_cli(tmp_path, opt)


def _check_recognize_cli(tmp_path, opt):
    """Label-free folder inference (recognize_cli.recognize)."""
    import evaluate_cli as ec
    import recognize_cli as rc

    from mrn_tpu.data.synthetic import make_task_dataset

    crops = tmp_path / "crops"
    crops.mkdir()
    ds = make_task_dataset("abc", 5, img_w=64, seed=7)
    for i in range(5):
        img, label = ds[i]
        img.save(str(crops / f"{i}_{label}.png"))

    ckpt = os.path.join(opt.output_dir, opt.exp_name,
                        f"{opt.lan_list[1]}_1_best_score.msgpack")
    learner = ec.load_learner(opt, ckpt, last_task=1)
    results = list(rc.recognize(learner, opt, str(crops)))
    assert len(results) == 5
    for path, word, conf in results:
        assert os.path.exists(path)
        assert isinstance(word, str)
        assert 0.0 <= conf <= 1.0


def _check_evaluate_cli(tmp_path, opt, train_root, test_root):
    """Standalone evaluation CLI on the trained checkpoint (subprocess)."""
    import subprocess

    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        f"""
common = dict(exp_name={opt.exp_name!r}, il="base", batch_max_length=8,
              imgH=32, imgW=64, manual_seed=111)
model = dict(Transformation="None", FeatureExtraction="VGG",
             SequenceModeling="BiLSTM", Prediction="CTC",
             input_channel=4, output_channel=64, hidden_size=32)
train = dict(lan_list={opt.lan_list!r}, select_data=[{train_root!r}],
             valid_datas=[{test_root!r}], batch_size=8, NED=True, workers=0)
""", encoding="utf-8")
    ckpt = os.path.join(opt.output_dir, opt.exp_name,
                        f"{opt.lan_list[1]}_1_best_score.msgpack")
    env = dict(os.environ, MRN_TPU_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, "evaluate_cli.py", "--config", str(cfg),
         "--saved_model", ckpt, "--eval_data", test_root, "--taski", "1"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "total_accuracy:" in proc.stdout


def _check_benchmark_all_eval(tmp_path, opt, test_root):
    """The reference's benchmark_all_eval surface (test.py:24-136): preset
    eval list, result/<exp>/log_all_evaluation.txt, evaluation_log/ files,
    and the batch_size=1 infer-time mode."""
    import evaluate_cli as ec

    ckpt = os.path.join(opt.output_dir, opt.exp_name,
                        f"{opt.lan_list[1]}_1_best_score.msgpack")
    opt.eval_type = "IL_STR"
    opt.eval_data = test_root + "/"
    learner = ec.load_learner(opt, ckpt, last_task=1)
    result_dir = str(tmp_path / "result")
    evlog_dir = str(tmp_path / "evaluation_log")
    total, names, accs = ec.benchmark_all_eval(
        learner, opt, 1, result_dir=result_dir,
        evaluation_log_dir=evlog_dir, eval_data_list=list(opt.lan_list))
    assert names == list(opt.lan_list) and len(accs) == 2
    content = (tmp_path / "result" / opt.exp_name /
               "log_all_evaluation.txt").read_text(encoding="utf-8")
    for field in ("dataset_root:", "Acc ", "Ned ", "accuracy: T0:",
                  "total_accuracy:", "averaged_infer_time:", "# parameters:",
                  "Total_accuracy:"):
        assert field in content, field
    evlogs = os.listdir(evlog_dir)
    assert len(evlogs) == 1 and evlogs[0].startswith("log_all_model_evaluation")

    # --log_multiple_test appends the tab-joined accuracy line to its own file
    ec.benchmark_all_eval(learner, opt, 1, log_multiple_test=True,
                          result_dir=result_dir, evaluation_log_dir=evlog_dir,
                          eval_data_list=[opt.lan_list[0]])
    assert any(f.startswith("log_multiple_test") for f in os.listdir(evlog_dir))

    # batch_size=1 per-image infer-time mode (test.py:56-61)
    ec.benchmark_all_eval(learner, opt, 1, calculate_infer_time=True,
                          result_dir=result_dir, evaluation_log_dir=evlog_dir,
                          eval_data_list=[opt.lan_list[0]])


def test_model_name_presets():
    """model_name → stage presets match reference test.py:476-492."""
    import evaluate_cli as ec

    for name, stages in (
            ("CRNN", ("None", "VGG", "BiLSTM", "CTC")),
            ("TRBA", ("TPS", "ResNet", "BiLSTM", "Attn")),
            ("RBA", ("None", "ResNet", "BiLSTM", "Attn"))):
        opt = default_options(model_name=name)
        ec.apply_model_name_presets(opt)
        assert (opt.Transformation, opt.FeatureExtraction,
                opt.SequenceModeling, opt.Prediction) == stages


def test_model_name_preset_gate(tmp_path):
    """The built-in model_name default ("CRNN") must not stomp a config's
    explicitly configured stages: presets apply only when the config (or
    the CLI) names one — reference test.py:467-492 maps cfg.test's value.
    load_config exposes explicit_keys so CLIs can tell config-set values
    from _DEFAULTS fallbacks."""
    from mrn_tpu.config import load_config

    implicit = tmp_path / "svtr_noname.py"
    implicit.write_text(
        'common = dict(exp_name="x")\n'
        'model = dict(Transformation="None", FeatureExtraction="SVTR",'
        ' SequenceModeling="None", Prediction="CTC")\n')
    explicit = tmp_path / "crnn_named.py"
    explicit.write_text('model = dict(model_name="CRNN")\n')
    opt_i = load_config(str(implicit))
    opt_e = load_config(str(explicit))
    assert "model_name" not in opt_i.explicit_keys
    assert "FeatureExtraction" in opt_i.explicit_keys
    assert "model_name" in opt_e.explicit_keys
