import time

import jax
import jax.numpy as jnp

from mrn_tpu.config import default_options
from mrn_tpu.models.composer import build_recognizer

B = 256
opt = default_options(Transformation="TPS", FeatureExtraction="ResNet",
                      SequenceModeling="BiLSTM", Prediction="Attn")
model = build_recognizer(opt, 4500)
rng = jax.random.PRNGKey(0)
image = jnp.zeros((B, 32, 256, 4), jnp.float32)
text = jnp.zeros((B, 1), jnp.int32)
variables = model.init({"params": rng, "droppath": rng}, image, train=False,
                       text=text)
variables = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating)
    else x, variables)


@jax.jit
def infer(image):
    out = model.apply(variables, image.astype(jnp.bfloat16), train=False,
                      is_train=False, text=text)
    return jnp.argmax(out["predict"], axis=2).astype(jnp.int32)


image = jax.device_put(image)
for _ in range(3):
    r = infer(image)
    jax.block_until_ready(r)
print("warm result sample:", r[0, :5])

# per-call blocking
t0 = time.perf_counter()
for _ in range(5):
    jax.block_until_ready(infer(image))
per_call = (time.perf_counter() - t0) / 5
print(f"per-call blocked: {per_call * 1000:.2f} ms -> {B / per_call:,.0f} crops/s")

# pipelined (bench methodology)
t0 = time.perf_counter()
for _ in range(5):
    out = infer(image)
jax.block_until_ready(out)
pipe = (time.perf_counter() - t0) / 5
print(f"pipelined: {pipe * 1000:.2f} ms -> {B / pipe:,.0f} crops/s")
