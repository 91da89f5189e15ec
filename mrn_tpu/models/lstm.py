"""LSTM sequence modeling as jitted lax.scan recurrences.

Replaces the reference's cuDNN-backed ``nn.LSTM(bidirectional=True)`` +
Linear stack (reference: modules/sequence_modeling.py:4-22) with a TPU-native
formulation: the input projections for ALL timesteps are computed as one big
MXU matmul ([B,T,in] @ [in,4H]); only the [B,H] @ [H,4H] recurrence runs under
lax.scan.  Gate order and initializers (U(+-1/sqrt(H)) for every weight and
bias) match torch's LSTM so checkpoints and accuracy are comparable.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrn_tpu.utils.torch_init import torch_lstm_default

__all__ = ["lstm_cell_step", "TorchLSTM", "BidirectionalLSTM"]


def lstm_cell_step(gates_x, h, c, w_hh):
    """One LSTM step. gates_x: [B,4H] (input projection incl. both biases),
    w_hh: [4H, H] (torch layout). Gate order i,f,g,o (torch)."""
    gates = gates_x + h @ w_hh.T
    hidden = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, 0 * hidden:1 * hidden])
    f = jax.nn.sigmoid(gates[:, 1 * hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:4 * hidden])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


class _DirectionalLSTM(nn.Module):
    hidden_size: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x):
        """x: [B, T, in] -> [B, T, H]"""
        b, t, in_size = x.shape
        h = self.hidden_size
        init = torch_lstm_default(h)
        w_ih = self.param("w_ih", init, (4 * h, in_size))
        w_hh = self.param("w_hh", init, (4 * h, h))
        b_ih = self.param("b_ih", init, (4 * h,))
        b_hh = self.param("b_hh", init, (4 * h,))

        if self.reverse:
            x = jnp.flip(x, axis=1)
        # One MXU matmul for all timesteps' input projections (accumulates in
        # f32 on the MXU; output keeps the input dtype so the scan carry dtype
        # is stable under bf16 inference).
        gates_x = jnp.einsum("bti,gi->btg", x, w_ih) + b_ih + b_hh

        def step(carry, gx):
            hh, cc = carry
            hh, cc = lstm_cell_step(gx, hh, cc, w_hh)
            return (hh, cc), hh

        h0 = jnp.zeros((b, h), x.dtype)
        c0 = jnp.zeros((b, h), x.dtype)
        _, out = jax.lax.scan(step, (h0, c0), jnp.swapaxes(gates_x, 0, 1))
        out = jnp.swapaxes(out, 0, 1)
        if self.reverse:
            out = jnp.flip(out, axis=1)
        return out


class TorchLSTM(nn.Module):
    """torch nn.LSTM(bidirectional=True, batch_first=True) equivalent."""

    hidden_size: int

    @nn.compact
    def __call__(self, x):
        fwd = _DirectionalLSTM(self.hidden_size, reverse=False, name="fwd")(x)
        bwd = _DirectionalLSTM(self.hidden_size, reverse=True, name="bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class BidirectionalLSTM(nn.Module):
    """BiLSTM + Linear(2H -> out) (reference: modules/sequence_modeling.py:4-22)."""

    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, x):
        from mrn_tpu.models.common import TorchDense

        rec = TorchLSTM(self.hidden_size, name="rnn")(x)
        return TorchDense(self.output_size, name="linear")(rec)
