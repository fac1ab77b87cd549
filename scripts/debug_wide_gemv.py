"""Debug harness: _gemv_val wide vs narrow vs dequantized matmul."""
import sys

sys.path.insert(0, ".")
import functools

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from web_rwkv_gguf_tpu.ops.pallas import config as pcfg
from web_rwkv_gguf_tpu.ops.pallas.layer7 import _gemv_val, _prep_matrix
from web_rwkv_gguf_tpu.quant.ggml import GgmlDType, quantize_q4_k
from web_rwkv_gguf_tpu.models.matrix import Matrix

pcfg.interpret = True

rng = np.random.default_rng(0)
m, k = 64, 256
w = (rng.normal(size=(m, k)) * 0.05).astype(np.float32)
raw = np.frombuffer(quantize_q4_k(w.reshape(-1)), np.uint8)
mat = Matrix.from_gguf_blocks(GgmlDType.Q4_K, raw, (m, k))
# stack to [1, m, kdim] form expected by _prep_matrix
mat3 = Matrix(mat.kind, mat.shape, {kk: a[None] for kk, a in mat.arrays.items()})
prep = _prep_matrix(mat3)
print("kind", mat.kind, "split", prep["split"], "codes", prep["codes"].shape,
      "st", prep["st"].shape, "off", prep["off"].shape)

wd = np.asarray(mat.dequantize(jnp.float32))
n = 5
x = (rng.normal(size=(n, k)) * 0.5).astype(np.float32)
ref = x @ wd.T

codes, st, off = prep["codes"][0], prep["st"][0], prep["off"][0]


def run(wide):
    def kern(x_ref, c_ref, s_ref, o_ref, y_ref):
        y_ref[:] = _gemv_val(
            x_ref[:].astype(jnp.bfloat16), c_ref[:], s_ref[:], o_ref[:],
            split=prep["split"], m=m, k=k, wide=wide,
        )

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=True,
    )(jnp.asarray(x), codes, st, off)


y_narrow = np.asarray(run(False))
y_wide = np.asarray(run(True))
print("narrow vs ref :", np.abs(y_narrow - ref).max())
print("wide   vs ref :", np.abs(y_wide - ref).max())
print("wide vs narrow:", np.abs(y_wide - y_narrow).max())
if np.abs(y_wide - y_narrow).max() > 1e-2:
    d = np.abs(y_wide - y_narrow)
    print("worst rows/cols:", np.unravel_index(d.argmax(), d.shape))
    print(y_wide[0, :8])
    print(y_narrow[0, :8])
