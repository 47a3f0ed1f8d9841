"""Full-bootstrap TPU drive for the multi-bit MXU path (cached keys).

Runs bootstrap_mxu end-to-end (blind rotate + sample extract + keyswitch)
on encrypted AND gates, checks decryption, and reports bootstraps/s/chip.
Env: PSET (default GATES_TPU_MB2), G (default 1024), GT (optional g_tile
override; empty = dispatch default).
"""
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from helm_tpu.compile_cache import enable_compile_cache
enable_compile_cache()
import os, time, numpy as np, jax, jax.numpy as jnp
from helm_tpu import params as P
from helm_tpu.fhe import keys as K, lwe, pbs_jnp, server_key
from helm_tpu.ops import mxu_pbs

pset = getattr(P, os.environ.get("PSET", "GATES_TPU_MB2"))
p = pset
ck_path = f"/tmp/ck_{p.name}.npz"
sk_path = f"/tmp/sk_{p.name}.npz"
if os.path.exists(sk_path):
    ck = K.load_client_key(ck_path)
    sk = K.load_server_key(sk_path)
    print("keys loaded", flush=True)
else:
    ck = lwe.keygen(p, seed=7)
    sk = server_key.gen_server_key(ck)
    K.save_client_key(ck_path, ck)
    K.save_server_key(sk_path, sk)
    print("keys generated+saved", flush=True)
dsk = pbs_jnp.DeviceServerKey.from_host(sk)

G = int(os.environ.get("G", "1024"))
gt_env = os.environ.get("GT", "")
kw = {"g_tile": int(gt_env)} if gt_env else {}
rng = np.random.default_rng(0)
b1 = rng.integers(0, 2, G).astype(bool)
b2 = rng.integers(0, 2, G).astype(bool)
lin = (
    lwe.encrypt(ck, lwe.encode_bool(b1)) + lwe.encrypt(ck, lwe.encode_bool(b2))
).astype(np.uint32)
lin[:, p.n] += np.uint32((-(1 << 29)) % (1 << 32))
testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
x = jnp.asarray(lin)

t0 = time.time()
out = mxu_pbs.bootstrap_mxu(dsk, x, testv, **kw)
outh = np.asarray(out)
print(f"compile+first {time.time()-t0:.1f}s", flush=True)
got = lwe.decode_bool(lwe.decrypt_phase(ck, outh))
print("correct:", bool((got == (b1 & b2)).all()), flush=True)
t0 = time.time()
iters = 6
for _ in range(iters):
    out = mxu_pbs.bootstrap_mxu(dsk, x, testv, **kw)
_ = np.asarray(out)
dt = time.time() - t0
print(
    f"bootstrap {p.name} G={G} gt={kw.get('g_tile', 'auto')}: "
    f"{G*iters/dt:.1f} bootstraps/s/chip",
    flush=True,
)
