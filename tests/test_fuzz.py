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
    src = random_levelized(f"fz{seed}", n_inputs=12, n_gates=48, n_outputs=6, seed=seed)
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


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_random_arith_dag_matches_oracle(seed):
    """Random arith DAGs (mixed op types, plain operands, shifts past the
    width, copies, div) through the dataflow scheduler == oracle."""
    from helm_tpu.engines.arith import ArithEngine

    src = random_arith(f"fa{seed}", n_inputs=5, n_gates=12, seed=seed)
    nl = parse_verilog(src, is_arith=True)
    c = Circuit.from_netlist(parse_verilog(src, is_arith=True))
    e = ArithEngine("u8", params=P.TEST_PARAMS_ARITH, seed=seed)
    e.compile(nl)
    rng = np.random.default_rng(seed)
    inputs = {f"x{i}": int(rng.integers(0, 256)) for i in range(5)}
    exp = c.evaluate_arith(
        c.initialize_wire_map(nl.wire_set, inputs, default=0), 8
    )
    out = e.decrypt_outputs(e.evaluate(e.encrypt_inputs(inputs)))
    for w, v in out.items():
        assert v == exp[w], (seed, w)
