"""Multi-bit MXU kernel diagnostics: gt sweep + stage ablations on TPU.

Keys are cached in /tmp so repeated sweeps skip the ~8 min multibit keygen.
Env: PSET (default GATES_TPU_MB2), G (default 1024), GTS (comma list),
ABLATES (comma-of-colon list, e.g. ":noladder:noptw" -> "", noladder, noptw).
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
ck = sk = None
if os.path.exists(sk_path):
    try:
        ck = K.load_client_key(ck_path)
        sk = K.load_server_key(sk_path)
        print("keys loaded", flush=True)
    except ValueError as e:  # CRT prime set changed: regenerate
        print(f"key cache invalid ({e})", flush=True)
if sk is None:
    ck = lwe.keygen(p, seed=7)
    sk = server_key.gen_server_key(ck)
    K.save_client_key(ck_path, ck)
    K.save_server_key(sk_path, sk)
    print("keys generated+saved", flush=True)
dsk = pbs_jnp.DeviceServerKey.from_host(sk)

G = int(os.environ.get("G", "1024"))
rng = np.random.default_rng(0)
b1 = rng.integers(0, 2, G).astype(bool)
b2 = rng.integers(0, 2, G).astype(bool)
lin = (
    lwe.encrypt(ck, lwe.encode_bool(b1)) + lwe.encrypt(ck, lwe.encode_bool(b2))
).astype(np.uint32)
lin[:, p.n] += np.uint32((-(1 << 29)) % (1 << 32))
testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
x = jnp.asarray(lin)
layout = os.environ.get("LAYOUT", "gm")  # gm | fs | fs16 | ts | hb
if layout == "fs":
    bsk_args = (mxu_pbs.mxu_server_key_fs(dsk),)
    rot_fn = mxu_pbs.blind_rotate_fs_mb
elif layout == "fs16":  # balanced-int16 BSK slab (round-4 splat A/B)
    bsk_args = (mxu_pbs.mxu_server_key_fs_i16(dsk),)
    rot_fn = mxu_pbs.blind_rotate_fs_mb
elif layout == "ps":  # prime-split grid kernel (round-5)
    bsk_args = (mxu_pbs.mxu_server_key_ps(dsk),)

    def rot_fn(p_, *a, ablate="", **kw):
        assert ablate == "", "ps kernel has no ablate probes"
        return mxu_pbs.blind_rotate_fs_ps(p_, *a, **kw)
elif layout == "ts":
    from helm_tpu.ops import ts_pbs

    bsk_args = (ts_pbs.mxu_server_key_ts(dsk),)
    rot_fn = ts_pbs.blind_rotate_ts_mb
elif layout == "hb":
    import functools

    from helm_tpu.ops import ts_pbs

    bsk_args = (ts_pbs.mxu_server_key_ts(dsk),)
    rot_fn = functools.partial(mxu_pbs.blind_rotate_fs_mb, tsptw=True)
elif layout == "hb2":  # hybrid + BSK limb-pair rows (blimb forced)
    from helm_tpu.ops import ts_pbs

    bsk_args = (ts_pbs.mxu_server_key_hb2(dsk),)

    def rot_fn(p_, *a, ablate="", **kw):
        ab = ",".join(x for x in ["blimb", ablate] if x)
        return mxu_pbs.blind_rotate_fs_mb(
            p_, *a, tsptw=True, ablate=ab, **kw
        )
else:
    bsk_args = mxu_pbs.mxu_server_key(dsk)
    rot_fn = mxu_pbs.blind_rotate_mxu_mb

gts = [int(v) for v in os.environ.get("GTS", "32").split(",")]
ablates = os.environ.get("ABLATES", "").split(":")

for gt in gts:
    for ab in ablates:
        t0 = time.time()
        acc = rot_fn(p, *bsk_args, x, testv, g_tile=gt, ablate=ab)
        _ = np.asarray(acc)
        compile_t = time.time() - t0
        t0 = time.time()
        iters = 6
        for _i in range(iters):
            acc = rot_fn(p, *bsk_args, x, testv, g_tile=gt, ablate=ab)
        _ = np.asarray(acc)
        dt = time.time() - t0
        print(
            f"{layout} gt={gt} ablate={ab!r}: {G*iters/dt:.1f} rot/s "
            f"(compile {compile_t:.1f}s)",
            flush=True,
        )
