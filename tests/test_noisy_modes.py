"""Noise-realistic DEFAULT-suite smoke tests, one per mode.

The production code paths run with sigma > 0 here (scaled-down noisy sets
TEST_NOISY_* — params.py documents each set's modeled failure rate, all
below 2^-35, so these never flake). This mirrors the reference's habit of
running real parameters in tests (reference: tests/circuit_test.rs:287)
without the multi-minute keygen of the 128-bit family, which stays in the
slow-marked suite (test_multibit.py)."""

import numpy as np

from helm_tpu import params as P
from helm_tpu.circuit.graph import Circuit
from helm_tpu.circuit.verilog import parse_verilog, read_verilog_file
from helm_tpu.engines.arith import ArithEngine
from helm_tpu.engines.boolean import BooleanEngine
from helm_tpu.io import csv_io


def test_noisy_gates_mode_end_to_end():
    nl = read_verilog_file("benchmarks/netlists/2-bit-adder.v")
    eng = BooleanEngine(mode="gates", params=P.TEST_NOISY_GATES_MB, seed=5)
    eng.compile(nl)
    ins = csv_io.read_input_wires(
        "benchmarks/test-cases/2-bit-adder.inputs.csv", "bool"
    )
    out = eng.decrypt_outputs(eng.evaluate(eng.encrypt_inputs(ins)))
    c = Circuit.from_netlist(nl)
    st = c.evaluate(c.initialize_wire_map(nl.wire_set, ins))
    assert {w: bool(v) for w, v in out.items()} == {
        w: bool(st[w]) for w in out
    }


def test_noisy_sequential_gates_three_cycles():
    nl = read_verilog_file("benchmarks/netlists/s27.v")
    eng = BooleanEngine(mode="gates", params=P.TEST_NOISY_GATES_MB, seed=5)
    eng.compile(nl)
    ins = csv_io.read_input_wires("benchmarks/test-cases/s27.inputs.csv", "bool")
    wires = eng.encrypt_inputs(ins)
    c = Circuit.from_netlist(nl)
    st = c.initialize_wire_map(nl.wire_set, ins)
    for _ in range(3):
        wires = eng.evaluate(wires)
        st = c.evaluate(st)
    out = eng.decrypt_outputs(wires)
    assert all(bool(out[w]) == bool(st[w]) for w in out)


def test_noisy_lut_mode_end_to_end():
    nl = read_verilog_file("benchmarks/netlists/8-bit-adder-lut-3-1.v")
    eng = BooleanEngine(mode="lut", params=P.TEST_NOISY_LUT, seed=5)
    eng.compile(nl)
    ins = csv_io.read_input_wires(
        "benchmarks/test-cases/8-bit-adder.inputs.csv", "bool"
    )
    out = eng.decrypt_outputs(eng.evaluate(eng.encrypt_inputs(ins)))
    c = Circuit.from_netlist(nl)
    st = c.evaluate(c.initialize_wire_map(nl.wire_set, ins))
    assert all(int(out[w]) & 1 == int(st[w]) for w in out)


def test_noisy_lut_k2_geometry_end_to_end():
    """The LUT_128_K2 deployment geometry (k=2 GLWE + B=2 keyswitch
    ladder), scaled down, with real noise — pins the k=2 multibit kernel
    and the long B=2 keyswitch path the 128-bit family now ships
    (SECURITY.md noise validation 2026-08-20)."""
    nl = read_verilog_file("benchmarks/netlists/8-bit-adder-lut-3-1.v")
    eng = BooleanEngine(mode="lut", params=P.TEST_NOISY_LUT_K2, seed=5)
    eng.compile(nl)
    ins = csv_io.read_input_wires(
        "benchmarks/test-cases/8-bit-adder.inputs.csv", "bool"
    )
    out = eng.decrypt_outputs(eng.evaluate(eng.encrypt_inputs(ins)))
    c = Circuit.from_netlist(nl)
    st = c.evaluate(c.initialize_wire_map(nl.wire_set, ins))
    assert all(int(out[w]) & 1 == int(st[w]) for w in out)


def test_noisy_arith_radix_ops():
    eng = ArithEngine("u8", params=P.TEST_NOISY_ARITH, seed=5)
    import jax.numpy as jnp

    xs = [17, 250, 3, 200]
    ys = [5, 10, 77, 129]
    x = jnp.asarray(np.stack([eng._encrypt_value(v) for v in xs]))
    y = jnp.asarray(np.stack([eng._encrypt_value(v) for v in ys]))
    add = eng.ops.add(x, y)
    mul = eng.ops.mul(x, y)
    for i in range(len(xs)):
        assert eng._decrypt_value(np.asarray(add[i])) == (xs[i] + ys[i]) % 256
        assert eng._decrypt_value(np.asarray(mul[i])) == (xs[i] * ys[i]) % 256


def test_noisy_arith_engine_netlist():
    src = """
module t(a, b, out);
  input [7:0] a, b;
  output [7:0] out;
  wire [7:0] s;
  add g0(a, b, s);
  mult g1(s, a, out);
endmodule
"""
    nl = parse_verilog(src, is_arith=True)
    eng = ArithEngine("u8", params=P.TEST_NOISY_ARITH, seed=7)
    eng.compile(nl)
    ins = {"a": 23, "b": 91}
    out = eng.decrypt_outputs(eng.evaluate(eng.encrypt_inputs(ins)))
    assert out["out"] == ((23 + 91) * 23) % 256
