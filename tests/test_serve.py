"""Serving daemon: directory watch, fixed-shape batching, output CSVs."""

import os

from helm_tpu.circuit.graph import Circuit
from helm_tpu.circuit.verilog import read_verilog_file
from helm_tpu.io import csv_io
from helm_tpu.serve import main


def test_serve_oneshot_gates(tmp_path):
    watch = tmp_path / "in"
    outd = tmp_path / "out"
    watch.mkdir()
    vecs = [(1, 1, 1, 0, 1), (0, 1, 1, 1, 0), (1, 0, 0, 0, 1)]
    for i, (a0, a1, b0, b1, cin) in enumerate(vecs):
        (watch / f"v{i}.csv").write_text(
            f"wire,value\na[0],{a0}\na[1],{a1}\nb[0],{b0}\nb[1],{b1}\ncin,{cin}\n"
        )
    rc = main([
        "-v", "benchmarks/netlists/2-bit-adder.v",
        "--watch", str(watch), "--outdir", str(outd),
        "--test-params", "--batch", "4", "--max-batches", "1",
    ])
    assert rc == 0
    nl = read_verilog_file("benchmarks/netlists/2-bit-adder.v")
    c = Circuit.from_netlist(nl)
    for i, (a0, a1, b0, b1, cin) in enumerate(vecs):
        got = csv_io.read_input_wires(str(outd / f"v{i}.out.csv"), "bool")
        ins = {
            "a[0]": bool(a0), "a[1]": bool(a1),
            "b[0]": bool(b0), "b[1]": bool(b1), "cin": bool(cin),
        }
        exp = c.evaluate(c.initialize_wire_map(nl.wire_set, ins))
        assert all(bool(exp[w]) == bool(v) for w, v in got.items()), i
        assert not (watch / f"v{i}.csv").exists()  # moved to done/
        assert (watch / "done" / f"v{i}.csv").exists()


def test_serve_oneshot_arith(tmp_path):
    watch = tmp_path / "in"
    outd = tmp_path / "out"
    watch.mkdir()
    (watch / "q.csv").write_text("wire,value\nn0,3\nn1,5\nn2,7\n")
    rc = main([
        "-v", "benchmarks/netlists/chi_squared_arith.v",
        "-a", "u8", "--watch", str(watch), "--outdir", str(outd),
        "--test-params", "--batch", "2", "--max-batches", "1",
    ])
    assert rc == 0
    got = csv_io.read_input_wires(str(outd / "q.out.csv"), "u8")
    assert got["alpha"] == ((4 * 3 * 7 - 25) ** 2) % 256
    assert got["beta1"] == (2 * (2 * 3 + 5) ** 2) % 256
