"""Probe: can PJRT serialize/deserialize a compiled Mosaic executable?

The axon plugin's persistent compilation cache never stores executables
containing Mosaic custom calls (ROADMAP #3). If
jax.experimental.serialize_executable round-trips one, bench/CLI can
pickle compiled programs to disk and get <10 s warm starts without the
plugin's cache. Prints VERDICT: works / fails with the error.
"""
import sys, pathlib, time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from helm_tpu import params as P
from helm_tpu.fhe import lwe, pbs_jnp, server_key
from helm_tpu.ops import mxu_pbs

p = P.TEST_PARAMS_MB  # tiny: fast compile, still a Mosaic kernel
ck = lwe.keygen(p, seed=11)
sk = server_key.gen_server_key(ck)
dsk = pbs_jnp.DeviceServerKey.from_host(sk)
bsk_fs = mxu_pbs.mxu_server_key_fs(dsk)
G = 8
rng = np.random.default_rng(0)
lin = lwe.encrypt(ck, lwe.encode_bool(rng.integers(0, 2, G).astype(bool)))
testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
x = jnp.asarray(lin.astype(np.uint32))


def fn(bsk, x, tv):
    return mxu_pbs.blind_rotate_fs_mb(p, bsk, x, tv, g_tile=8)


t0 = time.time()
lowered = jax.jit(fn).lower(bsk_fs, x, testv)
compiled = lowered.compile()
ref = np.asarray(compiled(bsk_fs, x, testv))
print(f"compiled+ran in {time.time()-t0:.1f}s", flush=True)

try:
    from jax.experimental import serialize_executable as se

    payload, in_tree, out_tree = se.serialize(compiled)
    print(f"serialized: {len(payload)} bytes", flush=True)
    reloaded = se.deserialize_and_load(payload, in_tree, out_tree)
    out = np.asarray(reloaded(bsk_fs, x, testv))
    ok = (out == ref).all()
    print(f"VERDICT: works (round-trip exact: {ok})", flush=True)
except Exception as e:  # noqa: BLE001 - probe reports any failure mode
    print(f"VERDICT: fails ({type(e).__name__}: {e})", flush=True)
