"""Decompose the SVTR bf16 train step: fwd-only vs fwd+bwd vs full step,
and the CTC-loss / head share (4500-class log-softmax).  Token-chained.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_svtr_train2.py
"""

import time

import jax
import jax.numpy as jnp
import optax

from mrn_tpu.config import default_options
from mrn_tpu.models.composer import build_recognizer
from mrn_tpu.ops.ctc import ctc_loss
from mrn_tpu.ops.schedules import onecycle_schedule

B = 256
DT = jnp.bfloat16


def timed(fn, *args):
    out = None
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 10 * 1000


def main():
    opt = default_options(Transformation="None", FeatureExtraction="SVTR",
                          SequenceModeling="None", Prediction="CTC")
    model = build_recognizer(opt, 4500)
    rng = jax.random.PRNGKey(0)
    image = jnp.zeros((B, opt.imgH, opt.imgW, opt.input_channel), jnp.float32)
    variables = model.init({"params": rng, "droppath": rng}, image,
                           train=False)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(DT) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, variables["params"])
    stats = variables.get("batch_stats", {})
    label = jnp.ones((B, 25), jnp.int32)
    length = jnp.full((B,), 5, jnp.int32)
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adam(onecycle_schedule(5e-4, 10000)))
    opt_state = tx.init(params)

    def fwd(p, image):
        out, _ = model.apply({"params": p, "batch_stats": stats},
                             image.astype(DT), train=True,
                             mutable=["batch_stats"],
                             rngs={"droppath": rng})
        return out["predict"]

    @jax.jit
    def fwd_only(p, image):
        return fwd(p, image).sum()

    @jax.jit
    def fwd_loss(p, image):
        return ctc_loss(fwd(p, image).astype(jnp.float32), label, length)

    @jax.jit
    def fwd_bwd_sum(p, image):
        # grads of sum(logits): full backward minus CTC's own bwd
        return jax.grad(lambda q: fwd(q, image).sum().astype(jnp.float32))(p)

    @jax.jit
    def fwd_bwd_ctc(p, image):
        return jax.grad(lambda q: ctc_loss(
            fwd(q, image).astype(jnp.float32), label, length))(p)

    @jax.jit
    def full_step(p, opt_state, image):
        loss, grads = jax.value_and_grad(lambda q: ctc_loss(
            fwd(q, image).astype(jnp.float32), label, length))(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    # eval-mode fwd (fused kernel) for reference
    @jax.jit
    def eval_fwd(p, image):
        out = model.apply({"params": p, "batch_stats": stats},
                          image.astype(DT), train=False)
        return out["predict"].sum()

    print(f"eval fwd (fused):      {timed(eval_fwd, params, image):7.1f} ms")
    print(f"train fwd only:        {timed(fwd_only, params, image):7.1f} ms")
    print(f"train fwd+CTC loss:    {timed(fwd_loss, params, image):7.1f} ms")
    print(f"train fwd+bwd (sum):   {timed(fwd_bwd_sum, params, image):7.1f} ms")
    print(f"train fwd+bwd (CTC):   {timed(fwd_bwd_ctc, params, image):7.1f} ms")

    def step_fn(p, o, image):
        p, o, loss = full_step(p, o, image)
        return loss
    out = None
    for _ in range(3):
        out = step_fn(params, opt_state, image)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = step_fn(params, opt_state, image)
    jax.block_until_ready(out)
    print(f"full step:             {(time.perf_counter()-t0)/10*1000:7.1f} ms")


if __name__ == "__main__":
    main()
