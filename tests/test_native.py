"""Native (C++) graph library vs the Python parser/scheduler."""

import pytest

from helm_tpu.circuit import native
from helm_tpu.circuit.graph import Circuit
from helm_tpu.circuit.verilog import read_verilog_file

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native/libhelm_graph.so not built"
)

NETLISTS = [
    ("benchmarks/netlists/2-bit-adder.v", False),
    ("benchmarks/netlists/s27.v", False),
    ("benchmarks/netlists/8-bit-adder-lut-3-1.v", False),
    ("benchmarks/netlists/c880-like.v", False),
    ("benchmarks/netlists/chi_squared_arith.v", True),
]


@pytest.mark.parametrize("path,is_arith", NETLISTS)
def test_native_matches_python(path, is_arith):
    nl_py = read_verilog_file(path, is_arith)
    c_py = Circuit.from_netlist(read_verilog_file(path, is_arith))
    nl_n, c_n = native.parse_and_levelize(path, is_arith)

    assert sorted(nl_n.inputs) == sorted(nl_py.inputs)
    assert sorted(nl_n.outputs) == sorted(nl_py.outputs)
    assert sorted(nl_n.dff_outputs) == sorted(nl_py.dff_outputs)
    assert nl_n.wire_set == nl_py.wire_set
    assert (nl_n.has_luts, nl_n.has_arith) == (nl_py.has_luts, nl_py.has_arith)

    # same gates per level (levels may be numbered differently only for DFFs)
    def level_sets(c):
        return [
            sorted((g.name, g.type.value, g.output, tuple(g.inputs)) for g in gs)
            for _, gs in c.levels
        ]

    assert level_sets(c_n) == level_sets(c_py)


def test_native_lut_consts():
    _, c = native.parse_and_levelize("benchmarks/netlists/8-bit-adder-lut-3-1.v")
    luts = [g for _, gs in c.levels for g in gs if g.lut_const is not None]
    assert luts and all(len(g.lut_const) == 8 for g in luts)
    py = read_verilog_file("benchmarks/netlists/8-bit-adder-lut-3-1.v")
    py_consts = {g.name: g.lut_const for g in py.gates if g.lut_const}
    for g in luts:
        assert g.lut_const == py_consts[g.name], g.name


def test_native_error_paths(tmp_path):
    bad = tmp_path / "bad.v"
    bad.write_text("module m(a);\n input a;\nendmodule\n")
    with pytest.raises(ValueError, match="no gates"):
        native.parse_and_levelize(str(bad))
    mixed = tmp_path / "mixed.v"
    mixed.write_text(
        "module m(a,b,c);\n input a, b;\n output c;\n"
        " lut g0(6, a, b, t);\n add g1(t, b, c);\nendmodule\n"
    )
    with pytest.raises(ValueError, match="mix LUTs"):
        native.parse_and_levelize(str(mixed))
