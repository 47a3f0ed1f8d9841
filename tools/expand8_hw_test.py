import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from helm_tpu.ops.mxu_pbs import _expand8

N1 = 8
rng = np.random.default_rng(0)
x = rng.integers(0, 61441, size=(6144, 8), dtype=np.uint32)
wide = 768
e8 = np.zeros((8, wide), np.float32)
lanes = np.arange(wide)
e8[lanes % N1, lanes] = 1.0

def kernel(x_ref, e_ref, o_ref):
    o_ref[...] = _expand8(x_ref[...], e_ref[:, :128])

out = pl.pallas_call(
    kernel,
    in_specs=[pl.BlockSpec((6144, 8), lambda: (0, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((8, wide), lambda: (0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((6144, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((6144, 128), jnp.uint32),
)(jnp.asarray(x), jnp.asarray(e8))
out = np.asarray(out)
exp = np.repeat(x, 16, axis=0).reshape(6144, 16, 8).transpose(0,1,2)  # wrong helper; compute directly
exp = np.tile(x, (1, 16))  # tile-wise: pattern repeated 16x -> lane g*8+jA
print("match:", np.array_equal(out, exp))
if not np.array_equal(out, exp):
    print("out[0]:", out[0][:20]); print("exp[0]:", exp[0][:20])
    print("diff count:", (out != exp).sum())
