import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mrn_tpu.ops.ctc import ctc_loss
from mrn_tpu.ops.grid_sample import grid_sample, grid_sample_matmul
from mrn_tpu.ops.losses import cross_entropy_dense, cross_entropy_ignore, kd_loss
from mrn_tpu.ops.metrics import edit_distance, ned_score
from mrn_tpu.ops.schedules import multistep_schedule, onecycle_schedule


# ---------- CTC ----------

def test_ctc_matches_torch(rng):
    b, t, c, n = 4, 12, 7, 5
    logits = rng.normal(size=(b, t, c)).astype(np.float32)
    labels = rng.integers(1, c, size=(b, n)).astype(np.int32)
    lengths = np.array([5, 3, 1, 4], dtype=np.int32)

    ours = float(ctc_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(lengths)))

    tl = torch.from_numpy(logits).log_softmax(2).permute(1, 0, 2)
    crit = torch.nn.CTCLoss(reduction="mean", zero_infinity=True)
    theirs = crit(tl, torch.from_numpy(labels.astype(np.int64)),
                  torch.full((b,), t, dtype=torch.int32),
                  torch.from_numpy(lengths.astype(np.int32)))
    assert abs(ours - float(theirs)) / abs(float(theirs)) < 1e-3


def test_ctc_zero_infinity(rng):
    # label longer than time steps -> infeasible -> contributes 0
    b, t, c = 2, 3, 5
    logits = rng.normal(size=(b, t, c)).astype(np.float32)
    labels = np.array([[1, 2, 3, 4, 1], [1, 0, 0, 0, 0]], dtype=np.int32)
    lengths = np.array([5, 1], dtype=np.int32)
    ours = float(ctc_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(lengths)))
    assert np.isfinite(ours)

    tl = torch.from_numpy(logits).log_softmax(2).permute(1, 0, 2)
    crit = torch.nn.CTCLoss(reduction="mean", zero_infinity=True)
    theirs = crit(tl, torch.from_numpy(labels.astype(np.int64)),
                  torch.full((b,), t, dtype=torch.int32),
                  torch.from_numpy(lengths.astype(np.int32)))
    assert abs(ours - float(theirs)) < 2e-3


# ---------- CE / KD ----------

def test_cross_entropy_ignore_matches_torch(rng):
    logits = rng.normal(size=(10, 6)).astype(np.float32)
    targets = rng.integers(0, 6, size=(10,)).astype(np.int64)
    targets[3] = 1
    targets[7] = 1
    ours = float(cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(targets.astype(np.int32)), 1))
    theirs = torch.nn.CrossEntropyLoss(ignore_index=1)(
        torch.from_numpy(logits), torch.from_numpy(targets))
    assert abs(ours - float(theirs)) < 1e-4


def test_kd_loss_matches_reference_formula(rng):
    p = rng.normal(size=(8, 5)).astype(np.float32)
    s = rng.normal(size=(8, 5)).astype(np.float32)
    ours = float(kd_loss(jnp.asarray(p), jnp.asarray(s), 2.0))
    pred = torch.log_softmax(torch.from_numpy(p) / 2.0, dim=1)
    soft = torch.softmax(torch.from_numpy(s) / 2.0, dim=1)
    theirs = -1 * torch.mul(soft, pred).sum() / pred.shape[0]
    assert abs(ours - float(theirs)) < 1e-4


# ---------- grid sample ----------

def _torch_grid_sample(img_nhwc, grid):
    t_img = torch.from_numpy(np.moveaxis(img_nhwc, -1, 1))
    t_grid = torch.from_numpy(grid)
    out = F.grid_sample(t_img, t_grid, mode="bilinear",
                        padding_mode="border", align_corners=True)
    return np.moveaxis(out.numpy(), 1, -1)


@pytest.mark.parametrize("fn", [grid_sample, grid_sample_matmul])
def test_grid_sample_matches_torch(rng, fn):
    b, h, w, c = 2, 8, 12, 3
    img = rng.normal(size=(b, h, w, c)).astype(np.float32)
    # grid beyond [-1,1] exercises the border clamp
    grid = (rng.uniform(-1.3, 1.3, size=(b, 6, 10, 2))).astype(np.float32)
    ours = np.asarray(fn(jnp.asarray(img), jnp.asarray(grid)))
    theirs = _torch_grid_sample(img, grid)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_sample_pallas_matches_torch(rng):
    """The fused VMEM-resident TPS warp kernel (interpret mode on CPU) must
    match torch grid_sample and the einsum path exactly."""
    from mrn_tpu.ops.grid_sample import grid_sample_pallas

    b, h, w, c = 4, 8, 16, 3
    ho, wo = 8, 12
    img = rng.normal(size=(b, h, w, c)).astype(np.float32)
    grid = (rng.uniform(-1.3, 1.3, size=(b, ho, wo, 2))).astype(np.float32)
    ours = np.asarray(grid_sample_pallas(jnp.asarray(img), jnp.asarray(grid),
                                         row_block=2, batch_block=2,
                                         interpret=True))
    theirs = _torch_grid_sample(img, grid)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    # non-tiling shapes fall back to the einsum path
    odd = np.asarray(grid_sample_pallas(jnp.asarray(img[:3]),
                                        jnp.asarray(grid[:3]),
                                        batch_block=2, interpret=True))
    np.testing.assert_allclose(odd, theirs[:3], atol=1e-5)


def test_grid_sample_identity(rng):
    b, h, w, c = 1, 4, 6, 2
    img = rng.normal(size=(b, h, w, c)).astype(np.float32)
    ys = np.linspace(-1, 1, h)
    xs = np.linspace(-1, 1, w)
    grid = np.stack(np.meshgrid(xs, ys), axis=-1)[None].astype(np.float32)
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_grid_sample_is_differentiable(rng):
    img = jnp.asarray(rng.normal(size=(1, 4, 4, 1)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1, 1, size=(1, 2, 2, 2)).astype(np.float32))
    g = jax.grad(lambda gr: grid_sample(img, gr).sum())(grid)
    assert np.isfinite(np.asarray(g)).all()


# ---------- schedules ----------

def test_onecycle_matches_torch():
    total = 50
    max_lr = 0.0005
    sched = onecycle_schedule(max_lr, total)
    p = torch.nn.Parameter(torch.zeros(1))
    optim = torch.optim.Adam([p], lr=max_lr)
    t_sched = torch.optim.lr_scheduler.OneCycleLR(
        optim, max_lr=max_lr, cycle_momentum=False, div_factor=20,
        final_div_factor=1000, total_steps=total)
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(optim.param_groups[0]["lr"])
        optim.step()
        t_sched.step()
    ours = [float(sched(i)) for i in range(total)]
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-5)


def test_multistep_schedule_fractional():
    sched = multistep_schedule(1.0, [0.5], 0.1, num_iter=100)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(50)) == pytest.approx(0.1)


# ---------- metrics ----------

def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "abc") == 0


def test_ned_score_matches_reference_rule():
    assert ned_score("", "abc") == 0.0
    assert ned_score("abc", "abc") == 1.0
    # len(gt) > len(prd): 1 - d/len(gt)
    assert ned_score("ab", "abcd") == pytest.approx(1 - 2 / 4)
    # else 1 - d/len(prd)
    assert ned_score("abcd", "ab") == pytest.approx(1 - 2 / 4)
