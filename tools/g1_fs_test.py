"""A/B: grouping=1 through the fs multi-bit kernel vs grouping=2.

Hypothesis: pointwise operand traffic ~ terms*steps. g=1 at k=3 has
32*704 = 22.5k term-steps vs g=2's 96*352 = 33.8k (0.667x), while the
per-step stages (transforms, decompose, CRT) double — measured shares
predict ~+15%. Env: G (default 1024), GT (default 512), INTERP=1 for the
CPU correctness pass. Decrypt-verifies before timing.
"""
import os, sys, pathlib, time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from helm_tpu.compile_cache import enable_compile_cache

enable_compile_cache()
import numpy as np
import jax.numpy as jnp
from dataclasses import replace

from helm_tpu import params as P
from helm_tpu.fhe import keys as K, lwe, pbs_jnp, server_key
from helm_tpu.ops import mxu_pbs

interp = os.environ.get("INTERP") == "1"
base = P.GATES_128_K3 if not interp else P.TEST_PARAMS_K3
p = replace(base, name=base.name + "_g1", grouping=1)
print(f"params: {p.name} n={p.n} k={p.k} N={p.N} l={p.pbs_level} g=1", flush=True)

ck_path, sk_path = f"/tmp/ck_{p.name}.npz", f"/tmp/sk_{p.name}.npz"
t0 = time.time()
ck = sk = None
if not interp and os.path.exists(sk_path):
    try:
        ck, sk = K.load_client_key(ck_path), K.load_server_key(sk_path)
    except ValueError as e:
        print(f"key cache invalid ({e})", flush=True)
if sk is None:
    ck = lwe.keygen(p, seed=7)
    bsk_ntt, bsk_sh = server_key.gen_bsk_multibit(ck)  # g=1 grouped layout
    sk = server_key.ServerKey(p, bsk_ntt, bsk_sh, server_key.gen_ksk(ck))
    if not interp:
        K.save_client_key(ck_path, ck)
        K.save_server_key(sk_path, sk)
print(f"keygen {time.time()-t0:.1f}s", flush=True)
dsk = pbs_jnp.DeviceServerKey.from_host(sk)
bsk_fs = mxu_pbs.mxu_server_key_fs(dsk)

G = int(os.environ.get("G", "1024" if not interp else "8"))
gt = int(os.environ.get("GT", "512" if not interp else "8"))
rng = np.random.default_rng(0)
b1 = rng.integers(0, 2, G).astype(bool)
b2 = rng.integers(0, 2, G).astype(bool)
lin = (lwe.encrypt(ck, lwe.encode_bool(b1)) + lwe.encrypt(ck, lwe.encode_bool(b2))).astype(np.uint32)
lin[:, p.n] += np.uint32((-(1 << 29)) % (1 << 32))
testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
x = jnp.asarray(lin)

t0 = time.time()
acc = mxu_pbs.blind_rotate_fs_mb(p, bsk_fs, x, testv, g_tile=gt, interpret=interp)
acc_np = np.asarray(acc)
print(f"compile+first {time.time()-t0:.1f}s", flush=True)

# correctness: sample-extract + decrypt the rotation output (AND gate)
from helm_tpu.fhe import ops as fops

big = fops.sample_extract(np, acc_np, p.k, p.N)
got = lwe.decode_bool(lwe.decrypt_phase(ck, big, big=True))
exp = b1 & b2
assert (got == exp).all(), f"g=1 fs rotation WRONG ({(got != exp).sum()}/{G})"
print("decrypt-verified ok", flush=True)

if interp:
    ref = np.asarray(pbs_jnp.blind_rotate_multibit(dsk, x, testv))
    print("matches jnp multibit reference:", (acc_np == ref).all(), flush=True)
    sys.exit(0)

iters = 6
t0 = time.time()
for _ in range(iters):
    acc = mxu_pbs.blind_rotate_fs_mb(p, bsk_fs, x, testv, g_tile=gt)
np.asarray(acc)
dt = time.time() - t0
print(f"g1 fs gt={gt}: {G*iters/dt:.1f} rot/s", flush=True)
