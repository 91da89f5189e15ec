"""SVTR train-step timing (fwd+CTC+bwd+clip+Adam) — f32 params (parity mode)
and bf16 compute comparison."""

import time

import jax
import jax.numpy as jnp
import optax

from mrn_tpu.config import default_options
from mrn_tpu.models.composer import build_recognizer
from mrn_tpu.ops.ctc import ctc_loss
from mrn_tpu.ops.schedules import onecycle_schedule

B = 256


def run(dtype):
    opt = default_options(Transformation="None", FeatureExtraction="SVTR",
                          SequenceModeling="None", Prediction="CTC")
    model = build_recognizer(opt, 4500)
    rng = jax.random.PRNGKey(0)
    image = jnp.zeros((B, opt.imgH, opt.imgW, opt.input_channel), jnp.float32)
    variables = model.init({"params": rng, "droppath": rng}, image, train=False)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        variables["params"])
    stats = variables.get("batch_stats", {})
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adam(onecycle_schedule(5e-4, 10000)))
    opt_state = tx.init(params)
    label = jnp.ones((B, 25), jnp.int32)
    length = jnp.full((B,), 5, jnp.int32)

    @jax.jit
    def step(params, stats, opt_state, image, rng):
        def loss_fn(p):
            out, mut = model.apply({"params": p, "batch_stats": stats},
                                   image.astype(dtype), train=True,
                                   mutable=["batch_stats"],
                                   rngs={"droppath": rng})
            return ctc_loss(out["predict"].astype(jnp.float32), label, length), \
                mut["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    for _ in range(3):
        params, stats, opt_state, loss = step(params, stats, opt_state, image, rng)
        jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(10):
        params, stats, opt_state, loss = step(params, stats, opt_state, image, rng)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / 10
    print(f"SVTR train step ({dtype.__name__}): {dt * 1000:.1f} ms "
          f"({B / dt:,.0f} imgs/s; 10k iters in {dt * 10000 / 60:.1f} min)")


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("f32", "both"):
        run(jnp.float32)
    if which in ("bf16", "both"):
        run(jnp.bfloat16)
