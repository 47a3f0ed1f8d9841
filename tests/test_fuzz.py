"""Property-based: random levelized circuits, encrypted == oracle."""

import numpy as np
import pytest

from helm_tpu import params as P
from helm_tpu.circuit.graph import Circuit
from helm_tpu.circuit.verilog import parse_verilog
from helm_tpu.engines.boolean import BooleanEngine

import sys

sys.path.insert(0, "benchmarks")
from gen_circuits import random_levelized  # noqa: E402


@pytest.fixture(scope="module")
def fuzz_engine():
    return BooleanEngine(mode="gates", params=P.TEST_PARAMS, seed=1000)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_circuit_encrypted_matches_oracle(fuzz_engine, seed):
    src = random_levelized(
        f"fz{seed}", n_inputs=12, n_gates=48, n_outputs=6, seed=seed,
        depth=8,
    )
    nl = parse_verilog(src)
    c = Circuit.from_netlist(parse_verilog(src))
    e = fuzz_engine
    e.compile(nl)
    rng = np.random.default_rng(seed * 7)
    inputs = {f"i[{j}]": bool(rng.integers(0, 2)) for j in range(12)}
    exp = c.evaluate(c.initialize_wire_map(nl.wire_set, inputs))
    got = e.decrypt_all_wires(e.evaluate(e.encrypt_inputs(inputs)))
    for w, v in exp.items():
        assert got[w] == v, (seed, w)


from gen_circuits import random_arith  # noqa: E402


@pytest.mark.parametrize(
    "seed,typ",
    [(11, "u8"), (12, "u8"), (13, "u8"), (14, "u16"), (15, "u16"), (16, "u32")],
)
def test_random_arith_dag_matches_oracle(seed, typ):
    """Random arith DAGs (mixed op types, plain operands incl. plain
    divisors, squarings, shifts past the width, copies, encrypted div)
    through the dataflow scheduler == oracle. u8 exercises the ripple
    carry paths, u16/u32 the log-depth propagate, the carry-only compare
    and the adaptive compressor endgame."""
    from helm_tpu.engines.arith import ArithEngine

    width = {"u8": 8, "u16": 16, "u32": 32}[typ]
    n_gates = 12 if typ == "u8" else 10
    src = random_arith(f"fa{seed}", n_inputs=5, n_gates=n_gates, seed=seed)
    nl = parse_verilog(src, is_arith=True)
    c = Circuit.from_netlist(parse_verilog(src, is_arith=True))
    e = ArithEngine(typ, params=P.TEST_PARAMS_ARITH, seed=seed)
    e.compile(nl)
    rng = np.random.default_rng(seed)
    inputs = {f"x{i}": int(rng.integers(0, 2**width)) for i in range(5)}
    exp = c.evaluate_arith(
        c.initialize_wire_map(nl.wire_set, inputs, default=0), width
    )
    out = e.decrypt_outputs(e.evaluate(e.encrypt_inputs(inputs)))
    for w, v in out.items():
        assert v == exp[w], (seed, w)


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(100, 140))
def test_broad_arith_fuzz(seed):
    """40-DAG campaign across u8/u16/u32 (run with -m slow)."""
    from helm_tpu.engines.arith import ArithEngine

    typ = ["u8", "u8", "u16", "u32"][seed % 4]
    width = {"u8": 8, "u16": 16, "u32": 32}[typ]
    src = random_arith(f"fz{seed}", n_inputs=4, n_gates=14, seed=seed)
    nl = parse_verilog(src, is_arith=True)
    c = Circuit.from_netlist(parse_verilog(src, is_arith=True))
    e = ArithEngine(typ, params=P.TEST_PARAMS_ARITH, seed=seed)
    e.compile(nl)
    rng = np.random.default_rng(seed)
    ins = {f"x{i}": int(rng.integers(0, 2**width)) for i in range(4)}
    exp = c.evaluate_arith(
        c.initialize_wire_map(nl.wire_set, ins, default=0), width
    )
    out = e.decrypt_outputs(e.evaluate(e.encrypt_inputs(ins)))
    for k, v in out.items():
        assert v == exp[k], (seed, k)


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(50, 62))
def test_broad_sequential_fuzz(seed):
    """Random 5-DFF sequential circuits, 3 cycles, all wires vs oracle."""
    from gen_circuits import random_sequential

    src = random_sequential(
        f"sq{seed}", n_inputs=6, n_dffs=5, n_gates=40, seed=seed, depth=6
    )
    nl = parse_verilog(src)
    c = Circuit.from_netlist(parse_verilog(src))
    e = BooleanEngine(mode="gates", params=P.TEST_PARAMS, seed=seed)
    e.compile(nl)
    rng = np.random.default_rng(seed)
    ins = {f"i[{j}]": bool(rng.integers(0, 2)) for j in range(6)}
    wires = e.encrypt_inputs(ins)
    wm = c.initialize_wire_map(nl.wire_set, ins)
    for _ in range(3):
        wires = e.evaluate(wires)
        wm = c.evaluate(wm)
    got = e.decrypt_all_wires(wires)
    for w, v in wm.items():
        if v is not None:
            assert bool(got[w]) == bool(v), (seed, w)
