import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os, time, numpy as np, jax, jax.numpy as jnp
from helm_tpu import params as P
from helm_tpu.fhe import lwe, pbs_jnp, server_key
from helm_tpu.ops import mxu_pbs

pset = getattr(P, os.environ.get("PSET", "GATES_PARAMS"))
p = pset
ck = lwe.keygen(p, seed=7)
dsk = pbs_jnp.DeviceServerKey.from_host(server_key.gen_server_key(ck))
print("keys done", flush=True)
G = int(os.environ.get("G", "256"))
gt = int(os.environ.get("GT", "16"))
rng = np.random.default_rng(0)
b1 = rng.integers(0,2,G).astype(bool); b2 = rng.integers(0,2,G).astype(bool)
lin = (lwe.encrypt(ck, lwe.encode_bool(b1)) + lwe.encrypt(ck, lwe.encode_bool(b2))).astype(np.uint32)
lin[:, p.n] += np.uint32((-(1<<29)) % (1<<32))
testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
x = jnp.asarray(lin)
t0 = time.time()
out = mxu_pbs.bootstrap_mxu(dsk, x, testv, g_tile=gt)
out.block_until_ready()
print("mxu compile+first", time.time()-t0, flush=True)
got = lwe.decode_bool(lwe.decrypt_phase(ck, np.asarray(out)))
print("correct:", (got == (b1 & b2)).all(), flush=True)
t0 = time.time(); iters = 6
for _ in range(iters):
    out = mxu_pbs.bootstrap_mxu(dsk, x, testv, g_tile=gt)
_ = np.asarray(out)  # force full materialization
dt = time.time()-t0
print(f"mxu {p.name} G={G} gt={gt}: {G*iters/dt:.1f} bootstraps/s/chip", flush=True)
