import time
import jax, jax.numpy as jnp
from mrn_tpu.config import default_options
from mrn_tpu.models.composer import build_recognizer

B=256; DTYPE=jnp.bfloat16
opt = default_options(Transformation="None", FeatureExtraction="SVTR", SequenceModeling="None", Prediction="CTC")
model = build_recognizer(opt, 4500)
rng = jax.random.PRNGKey(0)
x = jnp.zeros((B,32,256,4), DTYPE)
v = model.init({"params":rng,"droppath":rng}, x.astype(jnp.float32), train=False)
v = jax.tree_util.tree_map(lambda a: a.astype(DTYPE) if jnp.issubdtype(a.dtype,jnp.floating) else a, v)

def bench(fn):
    jfn = jax.jit(fn)
    for _ in range(3): jax.block_until_ready(jfn(x))
    t0=time.perf_counter()
    for _ in range(20): o=jfn(x)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/20*1000

ms_feat = bench(lambda xx: model.apply(v, xx, train=False, method=model.features_only))
print(f"backbone(features_only): {ms_feat:.2f} ms ({B/ms_feat*1000:,.0f} c/s)")
ms_logits = bench(lambda xx: model.apply(v, xx, train=False)["predict"])
print(f"backbone+fc logits:      {ms_logits:.2f} ms")
ms_full = bench(lambda xx: jnp.argmax(model.apply(v, xx, train=False)["predict"],2))
print(f"+argmax:                 {ms_full:.2f} ms")
