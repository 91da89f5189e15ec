"""Additive-attention LSTM decoder (the Attn prediction head;
reference: modules/prediction.py:8-118).

Both the teacher-forced training pass and the greedy evaluation pass are
single lax.scan programs over the (batch_max_length + 1) decode steps — the
TPU-native replacement for the reference's 26-iteration Python loop
(prediction.py:59-86).  The generator (classifier) is the shared growable
``fc`` passed in by the parent Recognizer (reference: modules/model.py:176-189
shares ``self.fc`` with the Attention generator).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrn_tpu.models.lstm import lstm_cell_step
from mrn_tpu.utils.torch_init import normal_init, torch_lstm_default

__all__ = ["AttentionDecoder"]


class AttentionCell(nn.Module):
    """i2h/h2h additive score + LSTMCell (reference: prediction.py:91-118)."""

    input_size: int
    hidden_size: int
    num_embeddings: int = 256

    def setup(self):
        from mrn_tpu.models.common import TorchDense

        self.i2h = TorchDense(self.hidden_size, use_bias=False, name="i2h")
        self.h2h = TorchDense(self.hidden_size, name="h2h")
        self.score = TorchDense(1, use_bias=False, name="score")
        init = torch_lstm_default(self.hidden_size)
        self.w_ih = self.param("w_ih", init,
                               (4 * self.hidden_size, self.input_size + self.num_embeddings))
        self.w_hh = self.param("w_hh", init, (4 * self.hidden_size, self.hidden_size))
        self.b_ih = self.param("b_ih", init, (4 * self.hidden_size,))
        self.b_hh = self.param("b_hh", init, (4 * self.hidden_size,))

    def __call__(self, prev_h, prev_c, batch_H, batch_H_proj, char_emb):
        prev_proj = self.h2h(prev_h)[:, None, :]
        e = self.score(jnp.tanh(batch_H_proj + prev_proj))  # [B, T, 1]
        alpha = jax.nn.softmax(e, axis=1)
        context = jnp.sum(alpha * batch_H, axis=1)  # [B, input_size]
        inp = jnp.concatenate([context, char_emb], axis=1)
        gates_x = inp @ self.w_ih.T + self.b_ih + self.b_hh
        return lstm_cell_step(gates_x, prev_h, prev_c, self.w_hh)


class AttentionDecoder(nn.Module):
    """num_steps = batch_max_length + 1 greedy/teacher-forced decoder.

    ``generator`` is a linen module shared with the parent's growable fc.
    """

    input_size: int
    hidden_size: int
    num_classes: int
    generator: nn.Module
    batch_max_length: int = 25
    num_char_embeddings: int = 256

    def setup(self):
        self.cell = AttentionCell(self.input_size, self.hidden_size,
                                  self.num_char_embeddings, name="attention_cell")
        # torch nn.Embedding default init: N(0, 1).
        self.char_embeddings = self.param(
            "char_embeddings", normal_init(1.0),
            (self.num_classes, self.num_char_embeddings))

    def _cut_unknown(self, idx, class_count):
        # clamp OOV ids (reference: prediction.py:35-36); class_count may be a
        # traced per-expert vocabulary size (MRN expert stacking)
        return jnp.where(idx >= class_count, 0, idx)

    def __call__(self, batch_H, text: Optional[jnp.ndarray], is_train: bool = True,
                 class_count=None):
        """batch_H: [B, T, input_size]; text: [B, num_steps] int32 (train:
        [SOS] + chars); returns [B, num_steps, num_classes].

        ``class_count``: effective vocabulary size of this decoder instance
        (defaults to num_classes); OOV clamping and the greedy argmax are
        restricted to it, so an expert padded to a larger class space behaves
        exactly like its original-size self (MRN parity)."""
        if class_count is None:
            class_count = self.num_classes
        b = batch_H.shape[0]
        num_steps = self.batch_max_length + 1
        batch_H_proj = self.cell.i2h(batch_H)

        if self.is_initializing():
            # Create cell/generator params eagerly: creating them inside the
            # lax.scan body would leak tracers out of the scan during init.
            h0 = jnp.zeros((b, self.hidden_size), batch_H.dtype)
            emb0 = jnp.zeros((b, self.num_char_embeddings), batch_H.dtype)
            self.cell(h0, h0, batch_H, batch_H_proj, emb0)
            self.generator(h0)

        if is_train:
            emb = jnp.take(self.char_embeddings,
                           self._cut_unknown(text[:, :num_steps], class_count),
                           axis=0)

            def step(carry, emb_t):
                h, c = carry
                h, c = self.cell(h, c, batch_H, batch_H_proj, emb_t)
                return (h, c), h

            h0 = jnp.zeros((b, self.hidden_size), batch_H.dtype)
            (_, _), hiddens = jax.lax.scan(step, (h0, h0),
                                           jnp.swapaxes(emb, 0, 1))
            hiddens = jnp.swapaxes(hiddens, 0, 1)  # [B, S, H]
            return self.generator(hiddens)

        # Greedy decode: feed back the argmax (reference: prediction.py:71-86).
        sos = text[:, 0] if text.ndim == 2 else text
        sos = jnp.broadcast_to(sos.reshape(-1)[:1], (b,)).astype(jnp.int32)

        col = jnp.arange(self.num_classes)

        def step(carry, _):
            h, c, target = carry
            emb_t = jnp.take(self.char_embeddings,
                             self._cut_unknown(target, class_count), axis=0)
            h, c = self.cell(h, c, batch_H, batch_H_proj, emb_t)
            probs_step = self.generator(h)
            # restrict the greedy pick to this decoder's true vocabulary
            masked = jnp.where(col[None, :] < class_count, probs_step, -jnp.inf)
            nxt = jnp.argmax(masked, axis=1).astype(jnp.int32)
            return (h, c, nxt), probs_step

        h0 = jnp.zeros((b, self.hidden_size), batch_H.dtype)
        (_, _, _), probs = jax.lax.scan(step, (h0, h0, sos), None,
                                        length=num_steps)
        return jnp.swapaxes(probs, 0, 1)  # [B, S, C]
