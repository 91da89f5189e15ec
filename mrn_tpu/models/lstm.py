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


class _LSTMParams(nn.Module):
    """One direction's weights in torch layout (scope name = "fwd"/"bwd" so
    checkpoints and the torch-parity tests keep their param paths)."""

    hidden_size: int
    in_size: int

    @nn.compact
    def __call__(self):
        h = self.hidden_size
        init = torch_lstm_default(h)
        return (self.param("w_ih", init, (4 * h, self.in_size)),
                self.param("w_hh", init, (4 * h, h)),
                self.param("b_ih", init, (4 * h,)),
                self.param("b_hh", init, (4 * h,)))


class TorchLSTM(nn.Module):
    """torch nn.LSTM(bidirectional=True, batch_first=True) equivalent.

    Both directions run in ONE direction-batched lax.scan: the carries are
    [2, B, H] and each step's recurrence is a batched matmul over the leading
    direction axis, so the sequential-step count is T instead of 2T and each
    step feeds the MXU twice the work.  Input projections for all timesteps
    remain one big MXU matmul outside the scan.
    """

    hidden_size: int

    @nn.compact
    def __call__(self, x):
        b, t, in_size = x.shape
        h = self.hidden_size
        fw_ih, fw_hh, fb_ih, fb_hh = _LSTMParams(h, in_size, name="fwd")()
        bw_ih, bw_hh, bb_ih, bb_hh = _LSTMParams(h, in_size, name="bwd")()

        w_ih = jnp.stack([fw_ih, bw_ih])          # [2, 4H, in]
        w_hh = jnp.stack([fw_hh, bw_hh])          # [2, 4H, H]
        bias = jnp.stack([fb_ih + fb_hh, bb_ih + bb_hh])  # [2, 4H]

        x2 = jnp.stack([x, jnp.flip(x, axis=1)])  # [2, B, T, in]
        # One MXU matmul for all timesteps' input projections (accumulates in
        # f32 on the MXU; output keeps the input dtype so the scan carry dtype
        # is stable under bf16 inference).
        gates_x = jnp.einsum("dbti,dgi->tdbg", x2, w_ih) + bias[:, None, :]

        def step(carry, gx):
            hh, cc = carry  # [2, B, H]
            gates = gx + jnp.einsum("dbh,dgh->dbg", hh, w_hh)
            i = jax.nn.sigmoid(gates[..., 0 * h:1 * h])
            f = jax.nn.sigmoid(gates[..., 1 * h:2 * h])
            g = jnp.tanh(gates[..., 2 * h:3 * h])
            o = jax.nn.sigmoid(gates[..., 3 * h:4 * h])
            cc = f * cc + i * g
            hh = o * jnp.tanh(cc)
            return (hh, cc), hh

        zeros = jnp.zeros((2, b, h), x.dtype)
        _, out = jax.lax.scan(step, (zeros, zeros), gates_x)  # [T, 2, B, H]
        fwd = jnp.swapaxes(out[:, 0], 0, 1)
        bwd = jnp.flip(jnp.swapaxes(out[:, 1], 0, 1), axis=1)
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
