"""Functional parameter surgery: the reference mutates modules in place
(update_fc row copies, weight_align rescale, DataParallel wrap churn;
modules/model.py:150-199) — here every task-boundary change is an explicit
pytree -> pytree transformation between jit regions.

Includes the reference's global task-0 init pass
(il_modules/base.py:52-65): kaiming-normal for every weight-like leaf, zeros
for biases, ones for norm scales, skipping the TPS ``localization_fc2`` — with
torch's fan-in conventions per layout.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["apply_reference_init", "grow_fc", "grow_fc_der", "reset_fc",
           "weight_align", "count_params"]

# leaf names that are torch-layout [out, in]-style weights (fan_in = shape[1])
_TORCH_LAYOUT_WEIGHTS = ("w_ih", "w_hh", "char_embeddings")


def _kaiming_for(path_names, shape):
    name = path_names[-1]
    if name.endswith("kernel"):
        if len(shape) == 2:
            fan_in = shape[0]
        else:  # conv [kh, kw, in, out]
            fan_in = shape[-2] * int(np.prod(shape[:-2]))
    elif name in _TORCH_LAYOUT_WEIGHTS:
        fan_in = shape[1]
    else:
        return None
    return math.sqrt(2.0 / max(1, fan_in))


def apply_reference_init(params, rng: jax.Array, stacked: Tuple[str, ...] = ()):
    """Reference build_model init pass over a params pytree.

    ``stacked`` names subtrees whose leaves carry one leading nn.vmap stack
    axis (e.g. DERNet's ``extractors``): fan-in there is computed on the
    per-slice shape — a stacked LSTM ``w_ih`` of [I, 4h, in] must read
    fan_in = in, not 4h, or every expert starts under-scaled."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves_with_path, treedef = flat
    keys = jax.random.split(rng, max(1, len(leaves_with_path)))

    new_leaves = []
    for (path, leaf), key in zip(leaves_with_path, keys):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if any("localization_fc2" in str(n) for n in names):
            new_leaves.append(leaf)  # pre-initialized, skipped by the pass
            continue
        name = str(names[-1])
        shape = leaf.shape
        if stacked and any(str(n) in stacked for n in names):
            shape = leaf.shape[1:]
        std = _kaiming_for([str(n) for n in names], shape)
        if std is not None:
            new_leaves.append(std * jax.random.normal(key, leaf.shape, leaf.dtype))
        elif name.endswith("bias") or name in ("b_ih", "b_hh"):
            new_leaves.append(jnp.zeros_like(leaf))
        elif name.endswith("scale"):
            new_leaves.append(jnp.ones_like(leaf))
        else:  # e.g. pos_embed: untouched by the reference pass
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _get_path(tree, path: Tuple[str, ...]):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set_path(tree, path: Tuple[str, ...], value):
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _set_path(tree[path[0]], path[1:], value)
    return out


def grow_fc(new_params, old_params, path: Tuple[str, ...] = ("fc",)):
    """Copy old fc rows into a freshly initialized larger fc
    (reference Model.update_fc, modules/model.py:150-160).

    flax Dense kernels are [in, out]: old output units are the leading
    columns; bias leading entries."""
    new_fc = {k: jnp.asarray(v) for k, v in _get_path(new_params, path).items()}
    old_fc = _get_path(old_params, path)
    old_out = old_fc["kernel"].shape[1]
    new_fc["kernel"] = new_fc["kernel"].at[:, :old_out].set(old_fc["kernel"])
    new_fc["bias"] = new_fc["bias"].at[:old_out].set(old_fc["bias"])
    return _set_path(new_params, path, new_fc)


def grow_fc_der(new_params, old_params, out_dim: int,
                path: Tuple[str, ...] = ("fc",)):
    """DER variant: the fc input dim also grew by out_dim; old weights occupy
    the leading input columns and leading output rows
    (reference DERNet.update_fc, modules/model.py:263-274)."""
    new_fc = {k: jnp.asarray(v) for k, v in _get_path(new_params, path).items()}
    old_fc = _get_path(old_params, path)
    old_in = old_fc["kernel"].shape[0]
    old_out = old_fc["kernel"].shape[1]
    new_fc["kernel"] = new_fc["kernel"].at[:old_in, :old_out].set(old_fc["kernel"])
    new_fc["bias"] = new_fc["bias"].at[:old_out].set(old_fc["bias"])
    return _set_path(new_params, path, new_fc)


def reset_fc(params, rng: jax.Array, path: Tuple[str, ...] = ("fc",),
             prediction_path: Tuple[str, ...] = None):
    """Re-initialize the classifier head in place of growing it — fresh
    torch-default (kaiming_uniform a=sqrt(5)) kernel, U(+-1/sqrt(fan_in))
    bias, same shape (reference Model.reset_class, modules/model.py:117-129;
    never called by any reference code path, kept for API parity).

    The reference rebuilds the WHOLE prediction module — for Prediction='Attn'
    that is the full decoder (char embeddings, attention cell, LSTM gates),
    not just the shared generator fc.  Pass ``prediction_path`` (e.g.
    ``('prediction',)``) to also re-initialize that subtree: Dense kernels get
    torch linear defaults, ``char_embeddings`` N(0,1) (flax Embed/our
    normal_init), and the LSTM-cell gate leaves U(+-1/sqrt(hidden)) — each
    leaf's torch-default init, matching a fresh ``Attention(...)`` build."""
    from mrn_tpu.utils.torch_init import torch_bias_default, torch_linear_default

    fc = dict(_get_path(params, path))
    k_rng, b_rng, pred_rng = jax.random.split(rng, 3)
    fan_in = fc["kernel"].shape[0]
    fc["kernel"] = torch_linear_default(k_rng, fc["kernel"].shape,
                                        fc["kernel"].dtype)
    if "bias" in fc:
        fc["bias"] = torch_bias_default(fan_in)(b_rng, fc["bias"].shape,
                                                fc["bias"].dtype)
    params = _set_path(params, path, fc)
    if prediction_path is None:
        return params

    def _reinit_subtree(tree, key):
        out = {}
        for name, leaf in tree.items():
            key, sub = jax.random.split(key)
            if isinstance(leaf, dict):
                if "kernel" in leaf:  # TorchDense
                    new = dict(leaf)
                    kk, bk = jax.random.split(sub)
                    new["kernel"] = torch_linear_default(
                        kk, leaf["kernel"].shape, leaf["kernel"].dtype)
                    if "bias" in leaf:
                        new["bias"] = torch_bias_default(
                            leaf["kernel"].shape[0])(bk, leaf["bias"].shape,
                                                     leaf["bias"].dtype)
                    out[name] = new
                else:
                    out[name], key = _reinit_subtree(leaf, sub), key
            elif name == "char_embeddings":
                out[name] = jax.random.normal(sub, leaf.shape, leaf.dtype)
            elif name.startswith(("w_", "b_")):  # LSTM-cell gates
                # Every gate leaf is [4H, ...] or [4H]; torch's nn.LSTMCell
                # draws ALL gate weights from U(+-1/sqrt(hidden_size)) —
                # including w_ih [4H, input_size], whose bound must NOT come
                # from its input dim (attention.py:39-44, torch_lstm_default).
                hidden = leaf.shape[0] // 4
                bound = 1.0 / float(np.sqrt(hidden))
                out[name] = jax.random.uniform(
                    sub, leaf.shape, leaf.dtype, -bound, bound)
            else:
                out[name] = leaf
        return out

    pred = _reinit_subtree(dict(_get_path(params, prediction_path)), pred_rng)
    return _set_path(params, prediction_path, pred)


def weight_align(params, increment: int, path: Tuple[str, ...] = ("fc",)):
    """WA's gamma-rescale of new-class weights by mean-norm ratio
    (reference: modules/model.py:166-174).  Norms are per output unit over the
    input dim; bias untouched."""
    fc = {k: jnp.asarray(v) for k, v in _get_path(params, path).items()}
    kernel = fc["kernel"]  # [in, out]
    new_norm = jnp.linalg.norm(kernel[:, -increment:], axis=0)
    old_norm = jnp.linalg.norm(kernel[:, :-increment], axis=0)
    gamma = old_norm.mean() / new_norm.mean()
    fc["kernel"] = kernel.at[:, -increment:].multiply(gamma)
    return _set_path(params, path, fc), float(gamma)


def count_params(params) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
