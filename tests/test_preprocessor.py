"""Preprocessor: Yosys gate netlists and behavioral arith -> processed form."""

import numpy as np

from helm_tpu.circuit.graph import Circuit
from helm_tpu.circuit.verilog import parse_verilog
from helm_tpu.preprocessor import convert_arith, convert_gates

YOSYS_FA = """
// full adder, yosys -noexpr style
module fa(a, b, cin, s, cout);
  input a, b, cin;
  output s, cout;
  wire w1, w2, w3;
  XOR2X1 u1 (.A(a), .B(b), .Y(w1));
  XOR2X1 u2 (.A(w1), .B(cin), .Y(s));
  $_AND_ u3 (.A(a), .B(b), .Y(w2));
  AND2X2 u4 (.A(cin), .B(w1), .Y(w3));
  OR2X1 u5 (.A(w2), .B(w3), .Y(cout));
endmodule
"""


def test_convert_gates_full_adder():
    out = convert_gates(YOSYS_FA)
    nl = parse_verilog(out)
    c = Circuit.from_netlist(nl)
    for a, b, cin in [(0, 0, 0), (1, 0, 1), (1, 1, 1), (0, 1, 0)]:
        wm = c.initialize_wire_map(
            nl.wire_set, {"a": bool(a), "b": bool(b), "cin": bool(cin)}
        )
        res = c.evaluate(wm)
        assert int(res["s"]) + 2 * int(res["cout"]) == a + b + cin


def test_convert_gates_mux_semantics():
    src = """
module m(a, b, s, y);
  input a, b, s;
  output y;
  $_MUX_ u1 (.A(a), .B(b), .S(s), .Y(y));
endmodule
"""
    nl = parse_verilog(convert_gates(src))
    c = Circuit.from_netlist(nl)
    for a, b, s in [(0, 1, 0), (0, 1, 1), (1, 0, 0), (1, 0, 1)]:
        wm = c.initialize_wire_map(
            nl.wire_set, {"a": bool(a), "b": bool(b), "s": bool(s)}
        )
        res = c.evaluate(wm)
        assert res["y"] == (bool(b) if s else bool(a))  # yosys: S ? B : A


BEHAVIORAL = """
// chi-squared style behavioral design
module chi(n0, n1, n2, alpha, beta1);
  input [31:0] n0, n1, n2;
  output [31:0] alpha, beta1;
  assign alpha = (4 * n0 * n2 - n1 * n1) * (4 * n0 * n2 - n1 * n1);
  assign beta1 = 2 * (2 * n0 + n1) * (2 * n0 + n1);
endmodule
"""


def test_convert_arith_expressions():
    out = convert_arith(BEHAVIORAL)
    nl = parse_verilog(out, True)
    c = Circuit.from_netlist(nl)
    n0, n1, n2 = 3, 5, 7
    wm = c.initialize_wire_map(
        nl.wire_set, {"n0": n0, "n1": n1, "n2": n2}, default=0
    )
    res = c.evaluate_arith(wm, 32)
    assert res["alpha"] == ((4 * n0 * n2 - n1 * n1) ** 2) % 2**32
    assert res["beta1"] == (2 * (2 * n0 + n1) * (2 * n0 + n1)) % 2**32


def test_convert_arith_shifts_precedence():
    src = """
module m(x, y, z);
  input [7:0] x, y;
  output [7:0] z;
  assign z = x + y * 2 >> 1;
endmodule
"""
    nl = parse_verilog(convert_arith(src), True)
    c = Circuit.from_netlist(nl)
    wm = c.initialize_wire_map(nl.wire_set, {"x": 10, "y": 3}, default=0)
    res = c.evaluate_arith(wm, 8)
    assert res["z"] == ((10 + 3 * 2) >> 1)  # shift binds loosest, like verilog
