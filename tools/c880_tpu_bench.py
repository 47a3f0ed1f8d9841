"""Headline benchmark: c880-scale gates-mode wall-clock on the real chip."""
import sys, pathlib, time, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from helm_tpu.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np
from helm_tpu import params as P
from helm_tpu.circuit.verilog import read_verilog_file
from helm_tpu.circuit.graph import Circuit
from helm_tpu.engines.boolean import BooleanEngine

pset = getattr(P, os.environ.get("PSET", "GATES_TPU"))
path = os.environ.get("NETLIST", "benchmarks/netlists/c880-like.v")
backend = os.environ.get("BACKEND", "jnp")
gt_env = os.environ.get("GT", "")
nl = read_verilog_file(path)
t0 = time.time()
fuse_env = os.environ.get("FUSE", "")  # unset = auto
e = BooleanEngine(
    mode="gates", params=pset, seed=88, backend=backend,
    g_tile=int(gt_env) if gt_env else None,
    fuse_levels=bool(int(fuse_env)) if fuse_env else None,
)
print(f"KeyGen {time.time()-t0:.1f}s", flush=True)
e.compile(nl)
rng = np.random.default_rng(7)
B = int(os.environ.get("BATCH", "0"))  # 0 = single vector
if B:
    inputs = [
        {w: bool(rng.integers(0, 2)) for w in nl.inputs} for _ in range(B)
    ]
else:
    inputs = {w: bool(rng.integers(0, 2)) for w in nl.inputs}
wires = e.encrypt_inputs(inputs)
t0 = time.time()
wires = e.evaluate(wires)
_ = np.asarray(wires)  # block_until_ready is not reliable on this platform
print(f"first evaluation (incl. compile): {time.time()-t0:.1f}s", flush=True)
# steady-state timing (force full materialization)
wires2 = e.encrypt_inputs(inputs)
t0 = time.time()
wires2 = e.evaluate(wires2)
_ = np.asarray(wires2)
dt = time.time() - t0
batch_note = f", batch={B} ({dt / B:.3f}s/vector)" if B else ""
print(
    f"{path} steady-state encrypted eval: {dt:.3f}s "
    f"({pset.name}, backend={backend}{batch_note})",
    flush=True,
)
# correctness
c = Circuit.from_netlist(read_verilog_file(path))
out = e.decrypt_outputs(wires2)
if B:
    ok = all(
        all(out[i][w] == v for w, v in
            ((w, c.evaluate(c.initialize_wire_map(nl.wire_set, inputs[i]))[w])
             for w in out[i]))
        for i in range(B)
    )
else:
    exp = c.evaluate(c.initialize_wire_map(nl.wire_set, inputs))
    ok = all(out[w] == exp[w] for w in out)
print("outputs correct:", ok, flush=True)
