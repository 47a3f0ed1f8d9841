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


def _truth(src, in_names, out_name, fn):
    nl = parse_verilog(convert_gates(src))
    c = Circuit.from_netlist(nl)
    n = len(in_names)
    for bits in range(1 << n):
        vals = {w: bool((bits >> i) & 1) for i, w in enumerate(in_names)}
        res = c.evaluate(c.initialize_wire_map(nl.wire_set, vals))
        assert res[out_name] == fn(**vals), (vals, res[out_name])


def _cell_module(cell, ports):
    conns = ", ".join(f".{p}({w})" for p, w in ports.items())
    ins = ", ".join(w for p, w in ports.items() if p != "Y")
    return f"""
module m({ins}, y);
  input {ins};
  output y;
  {cell} u1 ({conns}, .Y(y));
endmodule
"""


def test_convert_gates_complex_cells():
    """Every lowered Yosys internal cell matches simcells.v semantics."""
    cases = [
        ("$_ANDNOT_", dict(A="a", B="b"), lambda a, b: a and not b),
        ("$_ORNOT_", dict(A="a", B="b"), lambda a, b: a or not b),
        ("$_NMUX_", dict(A="a", B="b", S="s"),
         lambda a, b, s: not (b if s else a)),
        ("$_AOI3_", dict(A="a", B="b", C="c"),
         lambda a, b, c: not ((a and b) or c)),
        ("$_OAI3_", dict(A="a", B="b", C="c"),
         lambda a, b, c: not ((a or b) and c)),
        ("$_AOI4_", dict(A="a", B="b", C="c", D="d"),
         lambda a, b, c, d: not ((a and b) or (c and d))),
        ("$_OAI4_", dict(A="a", B="b", C="c", D="d"),
         lambda a, b, c, d: not ((a or b) and (c or d))),
    ]
    for cell, ports, fn in cases:
        src = _cell_module(cell, ports)
        _truth(src, sorted(set(ports.values())), "y", fn)


def test_convert_gates_mux4_mux8():
    src = """
module m(a, b, c, d, s, t, y);
  input a, b, c, d, s, t;
  output y;
  $_MUX4_ u1 (.A(a), .B(b), .C(c), .D(d), .S(s), .T(t), .Y(y));
endmodule
"""
    _truth(
        src, ["a", "b", "c", "d", "s", "t"], "y",
        lambda a, b, c, d, s, t: (d if s else c) if t else (b if s else a),
    )
    src8 = """
module m(a, b, c, d, e, f, g, h, s, t, u, y);
  input a, b, c, d, e, f, g, h, s, t, u;
  output y;
  $_MUX8_ u1 (.A(a), .B(b), .C(c), .D(d), .E(e), .F(f), .G(g), .H(h),
              .S(s), .T(t), .U(u), .Y(y));
endmodule
"""
    nl = parse_verilog(convert_gates(src8))
    c = Circuit.from_netlist(nl)
    import random

    rng = random.Random(7)
    data_w = list("abcdefgh")
    for _ in range(40):
        vals = {w: bool(rng.getrandbits(1)) for w in data_w + ["s", "t", "u"]}
        res = c.evaluate(c.initialize_wire_map(nl.wire_set, vals))
        idx = vals["s"] + 2 * vals["t"] + 4 * vals["u"]
        assert res["y"] == vals[data_w[idx]]


def _run_cycles(src, stimuli, out="q"):
    """Evaluate a 1-flop module over len(stimuli) cycles; return Q per cycle
    (Q after the cycle's state update)."""
    nl = parse_verilog(convert_gates(src))
    c = Circuit.from_netlist(nl)
    wm = c.initialize_wire_map(nl.wire_set, stimuli[0])
    qs = []
    for i, stim in enumerate(stimuli):
        if i:
            for k, v in stim.items():
                wm[k] = v
        wm = c.evaluate(wm)
        qs.append(bool(wm[out]))
    return qs


def test_convert_gates_dffe_sdff():
    # plain flop with explicit clock pin: C must be dropped, not taken as D
    src = """
module m(d, clk, q);
  input d, clk;
  output q;
  $_DFF_P_ u1 (.D(d), .C(clk), .Q(q));
endmodule
"""
    assert _run_cycles(src, [dict(d=True), dict(d=False)]) == [True, False]

    # enable flop: Q' = E ? D : Q
    src = """
module m(d, clk, e, q);
  input d, clk, e;
  output q;
  $_DFFE_PP_ u1 (.D(d), .C(clk), .E(e), .Q(q));
endmodule
"""
    qs = _run_cycles(src, [
        dict(d=True, e=True),   # load 1
        dict(d=False, e=False),  # hold
        dict(d=False, e=True),  # load 0
    ])
    assert qs == [True, True, False]

    # sync-reset flop, reset to 0, active high, priority over D
    src = """
module m(d, clk, r, q);
  input d, clk, r;
  output q;
  $_SDFF_PP0_ u1 (.D(d), .C(clk), .R(r), .Q(q));
endmodule
"""
    qs = _run_cycles(src, [
        dict(d=True, r=False),
        dict(d=True, r=True),   # reset wins
        dict(d=True, r=False),
    ])
    assert qs == [True, False, True]

    # sync reset to 1, active low, with active-high enable; reset priority
    src = """
module m(d, clk, r, e, q);
  input d, clk, r, e;
  output q;
  $_SDFFE_PN1P_ u1 (.D(d), .C(clk), .R(r), .E(e), .Q(q));
endmodule
"""
    qs = _run_cycles(src, [
        dict(d=False, r=False, e=False),  # reset (active low) beats enable
        dict(d=False, r=True, e=True),    # load 0
        dict(d=True, r=True, e=False),    # hold
    ])
    assert qs == [True, False, False]


def test_convert_gates_async_cells_rejected():
    import pytest

    src = """
module m(d, clk, r, q);
  input d, clk, r;
  output q;
  $_DFF_PP0_ u1 (.D(d), .C(clk), .R(r), .Q(q));
endmodule
"""
    with pytest.raises(ValueError, match="asynchronous"):
        convert_gates(src)


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
