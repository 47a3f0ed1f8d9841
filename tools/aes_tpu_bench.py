"""AES-128 transciphering benchmark on the real chip.

Gates-mode composite-field AES (benchmarks/netlists/aes128-gates.v,
41.4k gates / 358 levels) with the FIPS-197 C.1 vector; BATCH>0 evaluates
B blocks in one pass (ECB serving shape: block i = pt XOR i in byte 0).
Env: PSET (default GATES_TPU_MB2), BACKEND (jnp|mxu), FUSE, GT, BATCH.
"""
import sys, pathlib, time, os

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from helm_tpu.compile_cache import enable_compile_cache
enable_compile_cache()
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "benchmarks"))
import numpy as np
from gen_circuits import aes_encrypt
from helm_tpu import params as P
from helm_tpu.circuit.verilog import read_verilog_file
from helm_tpu.engines.boolean import BooleanEngine

PT = bytes.fromhex("00112233445566778899aabbccddeeff")
KEY = bytes.fromhex("000102030405060708090a0b0c0d0e0f")


def bits(pt, key):
    m = {}
    for j in range(16):
        for i in range(8):
            m[f"pt[{8 * j + i}]"] = bool((pt[j] >> i) & 1)
            m[f"key[{8 * j + i}]"] = bool((key[j] >> i) & 1)
    return m


pset = getattr(P, os.environ.get("PSET", "GATES_TPU_MB2"))
backend = os.environ.get("BACKEND", "mxu")
gt_env = os.environ.get("GT", "")
nl = read_verilog_file("benchmarks/netlists/aes128-gates.v")
t0 = time.time()
e = BooleanEngine(
    mode="gates", params=pset, seed=3, backend=backend,
    g_tile=int(gt_env) if gt_env else None,
    fuse_levels=(lambda v: bool(int(v)) if v else None)(os.environ.get("FUSE", "")),
)
print(f"KeyGen {time.time()-t0:.1f}s", flush=True)
e.compile(nl)
B = int(os.environ.get("BATCH", "0"))
pts = [bytes([PT[0] ^ i]) + PT[1:] for i in range(B or 1)]
inputs = [bits(p, KEY) for p in pts] if B else bits(PT, KEY)
wires = e.encrypt_inputs(inputs)
t0 = time.time()
wires = e.evaluate(wires)
_ = np.asarray(wires)
print(f"first eval (incl. compile): {time.time()-t0:.1f}s", flush=True)
w2 = e.encrypt_inputs(inputs)
t0 = time.time()
w2 = e.evaluate(w2)
_ = np.asarray(w2)
dt = time.time() - t0
per = dt / (B or 1)
print(
    f"AES-128 steady-state: {dt:.2f}s"
    + (f" for {B} blocks = {per:.2f}s/block" if B else "/block")
    + f" ({pset.name}, backend={backend})",
    flush=True,
)
out = e.decrypt_outputs(w2)
outs = out if isinstance(out, list) else [out]
ok = True
for i, o in enumerate(outs):
    ct = bytes(
        sum(int(o[f"ct[{8 * j + k}]"]) << k for k in range(8)) for j in range(16)
    )
    ok = ok and ct == aes_encrypt(pts[i], KEY)
print("ciphertexts correct:", ok, flush=True)
