"""Measure the cost of exact-erf GELU vs tanh approximation in SVTR."""
import time
import jax, jax.numpy as jnp
import flax.linen as nn
import mrn_tpu.models.svtr as svtr
from mrn_tpu.config import default_options
from mrn_tpu.models.composer import build_recognizer

B=256

def bench_model():
    opt = default_options(Transformation="None", FeatureExtraction="SVTR", SequenceModeling="None", Prediction="CTC")
    model = build_recognizer(opt, 4500)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((B,32,256,4), jnp.bfloat16)
    v = model.init({"params":rng,"droppath":rng}, x.astype(jnp.float32), train=False)
    v = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype,jnp.floating) else a, v)
    jfn = jax.jit(lambda xx: jnp.argmax(model.apply(v, xx, train=False)["predict"],2))
    for _ in range(3): jax.block_until_ready(jfn(x))
    t0=time.perf_counter()
    for _ in range(20): o=jfn(x)
    jax.block_until_ready(o)
    ms=(time.perf_counter()-t0)/20*1000
    print(f"{ms:.2f} ms ({B/ms*1000:,.0f} crops/s)")

print("exact erf gelu:")
bench_model()

# monkeypatch gelu to tanh approx
orig_gelu = nn.gelu
import mrn_tpu.models.svtr as s
real = jax.nn.gelu
def fast_gelu(x, approximate=False):
    return real(x, approximate=True)
s.nn.gelu = fast_gelu
print("tanh-approx gelu:")
bench_model()
