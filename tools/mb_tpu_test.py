import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os, time, numpy as np, jax, jax.numpy as jnp
from helm_tpu import params as P
from helm_tpu.fhe import lwe, pbs_jnp, server_key

pset = getattr(P, os.environ.get("PSET", "GATES_MB2"))
p = pset
t0=time.time()
ck = lwe.keygen(p, seed=7)
dsk = pbs_jnp.DeviceServerKey.from_host(server_key.gen_server_key(ck))
print("keys done", time.time()-t0, flush=True)
G = int(os.environ.get("G", "256"))
rng = np.random.default_rng(0)
b1 = rng.integers(0,2,G).astype(bool); b2 = rng.integers(0,2,G).astype(bool)
lin = (lwe.encrypt(ck, lwe.encode_bool(b1)) + lwe.encrypt(ck, lwe.encode_bool(b2))).astype(np.uint32)
lin[:, p.n] += np.uint32((-(1<<29)) % (1<<32))
testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
x = jnp.asarray(lin)
bs = jax.jit(pbs_jnp.bootstrap)
t0 = time.time()
out = bs(dsk, x, testv); out.block_until_ready()
print("compile+first", time.time()-t0, flush=True)
got = lwe.decode_bool(lwe.decrypt_phase(ck, np.asarray(out)))
print("correct:", (got == (b1 & b2)).all(), flush=True)
t0 = time.time(); iters = 4
for _ in range(iters):
    out = bs(dsk, x, testv)
_ = np.asarray(out)  # force full materialization (block_until_ready unreliable)
dt = time.time()-t0
print(f"{p.name} G={G}: {G*iters/dt:.1f} bootstraps/s/chip", flush=True)
