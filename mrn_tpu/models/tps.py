"""RARE-style TPS spatial transformer (reference: modules/transformation.py).

- LocalizationNetwork: conv stack predicting 2F fiducial coordinates, with the
  zero-weight / fixed-bias output init (transformation.py:88-100).
- GridGenerator: `inv_delta_C` (F+3, F+3) and `P_hat` (n, F+3) precomputed in
  host numpy at trace time (static constants in the jaxpr, the TPU-native
  equivalent of the reference's buffer registration, transformation.py:115-202);
  the per-batch grid is two MXU matmuls (transformation.py:204-216).
- Warp: bilinear border-padded align_corners grid sample (ops/grid_sample).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mrn_tpu.models.common import TorchConv, TorchDense, batch_norm, global_avg_pool, max_pool
from mrn_tpu.ops.grid_sample import grid_sample
from mrn_tpu.utils.torch_init import zeros_init

__all__ = ["TPSTransformer", "build_C", "build_inv_delta_C", "build_P_hat"]


def build_C(num_fiducial: int) -> np.ndarray:
    """Fiducial points of the rectified image (transformation.py:148-156)."""
    f2 = num_fiducial // 2
    x = np.linspace(-1.0, 1.0, f2)
    top = np.stack([x, -np.ones(f2)], axis=1)
    bottom = np.stack([x, np.ones(f2)], axis=1)
    return np.concatenate([top, bottom], axis=0)  # [F, 2]


def build_inv_delta_C(num_fiducial: int, C: np.ndarray) -> np.ndarray:
    """(F+3, F+3) TPS system inverse (transformation.py:158-178)."""
    f = num_fiducial
    hat_C = np.zeros((f, f))
    for i in range(f):
        for j in range(i, f):
            r = np.linalg.norm(C[i] - C[j])
            hat_C[i, j] = hat_C[j, i] = r
    np.fill_diagonal(hat_C, 1.0)
    hat_C = (hat_C ** 2) * np.log(hat_C)
    delta_C = np.concatenate([
        np.concatenate([np.ones((f, 1)), C, hat_C], axis=1),
        np.concatenate([np.zeros((2, 3)), C.T], axis=1),
        np.concatenate([np.zeros((1, 3)), np.ones((1, f))], axis=1),
    ], axis=0)
    return np.linalg.inv(delta_C)


def build_P_hat(num_fiducial: int, C: np.ndarray, size: Tuple[int, int],
                eps: float = 1e-6) -> np.ndarray:
    """(H*W, F+3) RBF expansion of the output grid (transformation.py:180-202)."""
    h, w = size
    gx = (np.arange(-w, w, 2) + 1.0) / w
    gy = (np.arange(-h, h, 2) + 1.0) / h
    P = np.stack(np.meshgrid(gx, gy), axis=2).reshape(-1, 2)  # [n, 2]
    n = P.shape[0]
    diff = P[:, None, :] - C[None, :, :]
    norm = np.linalg.norm(diff, axis=2)
    rbf = (norm ** 2) * np.log(norm + eps)
    return np.concatenate([np.ones((n, 1)), P, rbf], axis=1)


def _fc2_bias(num_fiducial: int) -> np.ndarray:
    """RARE Fig. 6(a) initial fiducial layout (transformation.py:90-99)."""
    f2 = num_fiducial // 2
    x = np.linspace(-1.0, 1.0, f2)
    top = np.stack([x, np.linspace(0.0, -1.0, f2)], axis=1)
    bottom = np.stack([x, np.linspace(1.0, 0.0, f2)], axis=1)
    return np.concatenate([top, bottom], axis=0).reshape(-1).astype(np.float32)


class LocalizationNetwork(nn.Module):
    num_fiducial: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, ch in enumerate((64, 128, 256, 512)):
            x = TorchConv(ch, (3, 3), padding=(1, 1), use_bias=False,
                          name=f"conv{i}")(x)
            x = nn.relu(batch_norm(x, train, name=f"bn{i}"))
            if i < 3:
                x = max_pool(x, (2, 2), (2, 2))
        x = global_avg_pool(x)  # AdaptiveAvgPool2d(1)
        x = nn.relu(TorchDense(256, name="localization_fc1")(x))
        bias0 = _fc2_bias(self.num_fiducial)
        x = nn.Dense(self.num_fiducial * 2, kernel_init=zeros_init,
                     bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(bias0, dtype),
                     name="localization_fc2")(x)
        return x.reshape(-1, self.num_fiducial, 2)


class TPSTransformer(nn.Module):
    num_fiducial: int
    out_size: Tuple[int, int]  # (H, W) of the rectified image

    @nn.compact
    def __call__(self, image, train: bool = True):
        b = image.shape[0]
        C = build_C(self.num_fiducial)
        inv_delta_C = jnp.asarray(build_inv_delta_C(self.num_fiducial, C),
                                  jnp.float32)
        P_hat = jnp.asarray(build_P_hat(self.num_fiducial, C, self.out_size),
                            jnp.float32)

        c_prime = LocalizationNetwork(self.num_fiducial,
                                      name="localization")(image, train)
        c_prime_pad = jnp.concatenate(
            [c_prime, jnp.zeros((b, 3, 2), c_prime.dtype)], axis=1)
        T = jnp.einsum("fk,bkt->bft", inv_delta_C, c_prime_pad,
                       preferred_element_type=jnp.float32)
        grid = jnp.einsum("nf,bft->bnt", P_hat, T,
                          preferred_element_type=jnp.float32)
        grid = grid.reshape(b, self.out_size[0], self.out_size[1], 2)
        # eval mode takes the fused Pallas warp (forward-only); training
        # keeps the differentiable einsum path
        return grid_sample(image, grid, inference=not train)
