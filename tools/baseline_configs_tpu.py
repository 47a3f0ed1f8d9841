"""Run the remaining BASELINE.json configs on the real chip, production params.

Env: ONLY=substring (run matching configs), BACKEND=jnp|pallas|mxu,
PARAMS=<name in helm_tpu.params> (overrides the per-config default),
FUSE=1 (fuse levels into one lax.scan launch)."""
import os, sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
from helm_tpu import params as P
from helm_tpu.circuit.verilog import read_verilog_file
from helm_tpu.circuit.graph import Circuit
from helm_tpu.engines.boolean import BooleanEngine
from helm_tpu.io import csv_io

ONLY = os.environ.get("ONLY", "")
BACKEND = os.environ.get("BACKEND", "jnp")
POVR = getattr(P, os.environ["PARAMS"]) if os.environ.get("PARAMS") else None
FUSE = (lambda v: bool(int(v)) if v else None)(os.environ.get("FUSE", ""))

def run(name, path, mode, params, inputs, cycles=1):
    if ONLY and ONLY not in name:
        return
    params = POVR or params
    nl = read_verilog_file(path)
    t0 = time.time()
    e = BooleanEngine(
        mode=mode, params=params, seed=5, backend=BACKEND, fuse_levels=FUSE
    )
    kg = time.time() - t0
    e.compile(nl)
    wires = e.encrypt_inputs(inputs)
    t0 = time.time()
    for _ in range(cycles):
        wires = e.evaluate(wires)
    _ = np.asarray(wires)
    first = time.time() - t0
    w2 = e.encrypt_inputs(inputs)
    t0 = time.time()
    for _ in range(cycles):
        w2 = e.evaluate(w2)
    _ = np.asarray(w2)
    steady = time.time() - t0
    # oracle check
    c = Circuit.from_netlist(read_verilog_file(path))
    st = c.initialize_wire_map(nl.wire_set, inputs)
    for _ in range(cycles):
        st = c.evaluate(st)
    out = e.decrypt_outputs(w2)
    ok = all(bool(out[w]) == bool(st[w]) for w in out)
    print(f"{name}: keygen {kg:.1f}s, first {first:.2f}s, steady {steady:.2f}s, correct={ok}", flush=True)

adder_in = csv_io.read_input_wires("benchmarks/test-cases/2-bit-adder.inputs.csv", "bool")
run("2-bit-adder (gates)", "benchmarks/netlists/2-bit-adder.v", "gates", P.GATES_TPU, adder_in)
s27_in = csv_io.read_input_wires("benchmarks/test-cases/s27.inputs.csv", "bool")
run("s27 x3 cycles (gates, sequential)", "benchmarks/netlists/s27.v", "gates", P.GATES_TPU, s27_in, cycles=3)
lut_in = csv_io.read_input_wires("benchmarks/test-cases/8-bit-adder.inputs.csv", "bool")
run("8-bit-adder-lut-3-1 (LUTs)", "benchmarks/netlists/8-bit-adder-lut-3-1.v", "lut", P.LUT_PARAMS, lut_in)
