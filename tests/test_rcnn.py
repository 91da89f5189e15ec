"""Torch-oracle parity for the RCNN/GRCL extractor (reference:
modules/feature_extraction.py:50-97, 113-162).  The oracle reimplements the
reference math in torch and loads the flax params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from mrn_tpu.models.rcnn import RCNNExtractor


class TorchGRCL(tnn.Module):
    """Reference GRCL math (feature_extraction.py:113-162): shared recurrent
    convs, per-iteration BN units."""

    def __init__(self, in_ch, out_ch, n_iter=5, k=3):
        super().__init__()
        p = k // 2
        self.n_iter = n_iter
        self.wgf_u = tnn.Conv2d(in_ch, out_ch, 1, 1, 0, bias=False)
        self.wgr_x = tnn.Conv2d(out_ch, out_ch, 1, 1, 0, bias=False)
        self.wf_u = tnn.Conv2d(in_ch, out_ch, k, 1, p, bias=False)
        self.wr_x = tnn.Conv2d(out_ch, out_ch, k, 1, p, bias=False)
        self.bn_init = tnn.BatchNorm2d(out_ch)
        self.bn_gfu = tnn.ModuleList(tnn.BatchNorm2d(out_ch) for _ in range(n_iter))
        self.bn_grx = tnn.ModuleList(tnn.BatchNorm2d(out_ch) for _ in range(n_iter))
        self.bn_fu = tnn.ModuleList(tnn.BatchNorm2d(out_ch) for _ in range(n_iter))
        self.bn_rx = tnn.ModuleList(tnn.BatchNorm2d(out_ch) for _ in range(n_iter))
        self.bn_gx = tnn.ModuleList(tnn.BatchNorm2d(out_ch) for _ in range(n_iter))

    def forward(self, x):
        wgf_u = self.wgf_u(x)
        wf_u = self.wf_u(x)
        h = F.relu(self.bn_init(wf_u))
        for i in range(self.n_iter):
            g = torch.sigmoid(self.bn_gfu[i](wgf_u) + self.bn_grx[i](self.wgr_x(h)))
            h = F.relu(self.bn_fu[i](wf_u) + self.bn_gx[i](self.bn_rx[i](self.wr_x(h)) * g))
        return h


class TorchRCNN(tnn.Module):
    """Reference RCNN_FeatureExtractor stack (feature_extraction.py:53-97)."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        oc = [out_ch // 8, out_ch // 4, out_ch // 2, out_ch]
        self.conv0 = tnn.Conv2d(in_ch, oc[0], 3, 1, 1)
        self.grcl0 = TorchGRCL(oc[0], oc[0])
        self.grcl1 = TorchGRCL(oc[0], oc[1])
        self.grcl2 = TorchGRCL(oc[1], oc[2])
        self.conv1 = tnn.Conv2d(oc[2], oc[3], 2, 1, 0, bias=False)
        self.bn1 = tnn.BatchNorm2d(oc[3])

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.conv0(x)), 2, 2)
        x = F.max_pool2d(self.grcl0(x), 2, 2)
        x = F.max_pool2d(self.grcl1(x), 2, (2, 1), (0, 1))
        x = F.max_pool2d(self.grcl2(x), 2, (2, 1), (0, 1))
        return F.relu(self.bn1(self.conv1(x)))


def _copy_conv(tconv, fparams):
    w = np.asarray(fparams["Conv_0"]["kernel"])  # HWIO -> OIHW
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1).copy()))
        if tconv.bias is not None:
            tconv.bias.copy_(torch.from_numpy(np.asarray(fparams["Conv_0"]["bias"])))


def _copy_bn(tbn, fparams, fstats):
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(np.asarray(fparams["scale"])))
        tbn.bias.copy_(torch.from_numpy(np.asarray(fparams["bias"])))
        tbn.running_mean.copy_(torch.from_numpy(np.asarray(fstats["mean"])))
        tbn.running_var.copy_(torch.from_numpy(np.asarray(fstats["var"])))


def _copy_grcl(tg, fp, fs):
    for name in ("wgf_u", "wgr_x", "wf_u", "wr_x"):
        _copy_conv(getattr(tg, name), fp[name])
    _copy_bn(tg.bn_init, fp["bn_x_init"], fs["bn_x_init"])
    for i in range(tg.n_iter):
        for short, mlist in (("gfu", tg.bn_gfu), ("grx", tg.bn_grx),
                             ("fu", tg.bn_fu), ("rx", tg.bn_rx),
                             ("gx", tg.bn_gx)):
            _copy_bn(mlist[i], fp[f"u{i}_bn_{short}"], fs[f"u{i}_bn_{short}"])


def test_rcnn_matches_torch():
    out_ch, in_ch = 32, 4
    model = RCNNExtractor(out_ch)
    x = np.random.default_rng(0).normal(size=(2, 32, 32, in_ch)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert ours.shape == (2, 1, 32 // 4 + 1, out_ch)

    fp, fs = variables["params"], variables["batch_stats"]
    tm = TorchRCNN(in_ch, out_ch).eval()
    _copy_conv(tm.conv0, fp["conv0"])
    _copy_conv(tm.conv1, fp["conv1"])
    _copy_bn(tm.bn1, fp["bn1"], fs["bn1"])
    for i in range(3):
        _copy_grcl(getattr(tm, f"grcl{i}"), fp[f"grcl{i}"], fs[f"grcl{i}"])

    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), atol=2e-4)


def test_rcnn_recognizer_end_to_end():
    from mrn_tpu.config import default_options
    from mrn_tpu.models.composer import build_recognizer, sequence_length

    opt = default_options(imgW=64, output_channel=32, hidden_size=16,
                          Transformation="None", FeatureExtraction="RCNN",
                          SequenceModeling="BiLSTM", Prediction="CTC")
    model = build_recognizer(opt, 11)
    image = jnp.zeros((2, 32, 64, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), image, train=False)
    out = model.apply(variables, image, train=False)
    t = sequence_length("RCNN", 64)
    assert out["predict"].shape == (2, t, 11)
