"""DM-Router: dual-domain (spatial + channel) gating over stacked expert
features (reference: modules/dm_router.py:1-67).

Input [B, I, T, C] (I experts, T patches, C channels); the gating algebra is
preserved exactly:

  shortcut = x
  x = LN_C(x); x = proj_1 (C -> 2C); GELU
  x = reshape [B, I*T, 2C]; SpatialDomainGating: split (u, v); v = LN_C(v);
      v = Linear_{I*T}(v^T)^T; x = u * v
  x = proj_2 (C -> C); reshape back; x += shortcut
  x = reshape [B, I*C, T]; ChannelDomainGating: v = LN_T(x);
      v = Linear_{I*C}(v^T)^T; x = x * v
  x = reshape back; proj_3 (C -> C); return x + shortcut
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mrn_tpu.models.common import TorchDense

__all__ = ["DMRouter"]


def _ln(name):
    # torch nn.LayerNorm defaults: eps 1e-5, affine.
    return nn.LayerNorm(epsilon=1e-5, name=name)


class DMRouter(nn.Module):
    channel: int   # C (the hidden size)
    d_ffn: int     # 2C
    patch: int     # T
    domain: int    # I (number of experts)

    @nn.compact
    def __call__(self, x):
        b, i, t, c = x.shape
        assert i == self.domain and t == self.patch and c == self.channel
        shortcut = x

        h = _ln("norm")(x)
        h = TorchDense(self.d_ffn, name="proj_1")(h)
        h = nn.gelu(h, approximate=False)
        h = h.reshape(b, i * t, self.d_ffn)

        # SpatialDomainGating (dm_router.py:4-17)
        u, v = jnp.split(h, 2, axis=-1)
        v = _ln("spatial_norm")(v)
        v = jnp.swapaxes(v, 1, 2)                      # [B, C, I*T]
        v = TorchDense(i * t, name="spatial_proj")(v)  # Linear over seq dim
        v = jnp.swapaxes(v, 1, 2)
        h = u * v

        h = TorchDense(self.channel, name="proj_2")(h)
        h = h.reshape(b, i, t, c)
        h = h + shortcut

        # ChannelDomainGating (dm_router.py:19-33)
        g = h.reshape(b, i * c, t)
        v = _ln("channel_norm")(g)                     # LN over T
        v = jnp.swapaxes(v, 1, 2)                      # [B, T, I*C]
        v = TorchDense(i * c, name="channel_proj")(v)
        v = jnp.swapaxes(v, 1, 2)
        g = g * v
        h = g.reshape(b, i, t, c)

        h = TorchDense(self.channel, name="proj_3")(h)
        return h + shortcut
