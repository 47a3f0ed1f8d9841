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


def test_serve_quarantines_malformed_csv(tmp_path):
    """A garbage or truncated CSV moves to failed/ with an error note and
    never sinks the batch it arrived with (round-4 hardening)."""
    watch = tmp_path / "in"
    outd = tmp_path / "out"
    watch.mkdir()
    (watch / "bad1.csv").write_bytes(b"\x00\xff\xfenot a csv")
    (watch / "bad2.csv").write_text("wire,value\na[0],1\n")  # missing wires
    (watch / "good.csv").write_text(
        "wire,value\na[0],1\na[1],0\nb[0],1\nb[1],1\ncin,0\n"
    )
    rc = main([
        "-v", "benchmarks/netlists/2-bit-adder.v",
        "--watch", str(watch), "--outdir", str(outd),
        "--test-params", "--batch", "3", "--max-batches", "1",
        "--linger", "0.1",
    ])
    assert rc == 0
    assert (outd / "good.out.csv").exists()
    assert (watch / "done" / "good.csv").exists()
    for bad in ("bad1.csv", "bad2.csv"):
        assert (watch / "failed" / bad).exists(), bad
        assert (watch / "failed" / f"{bad}.error.txt").read_text().strip()
        assert not (outd / f"{bad[:-4]}.out.csv").exists()
    # the truncated file's note names what was missing
    assert "missing input wires" in (
        watch / "failed" / "bad2.csv.error.txt"
    ).read_text()


def test_serve_partial_batch_linger_flush(tmp_path):
    """Fewer inputs than --batch still evaluate after the linger window
    (padded to the fixed shape internally)."""
    watch = tmp_path / "in"
    outd = tmp_path / "out"
    watch.mkdir()
    (watch / "only.csv").write_text(
        "wire,value\na[0],1\na[1],1\nb[0],0\nb[1],1\ncin,1\n"
    )
    rc = main([
        "-v", "benchmarks/netlists/2-bit-adder.v",
        "--watch", str(watch), "--outdir", str(outd),
        "--test-params", "--batch", "4", "--max-batches", "1",
        "--linger", "0.2", "--poll", "0.05",
    ])
    assert rc == 0
    got = csv_io.read_input_wires(str(outd / "only.out.csv"), "bool")
    nl = read_verilog_file("benchmarks/netlists/2-bit-adder.v")
    c = Circuit.from_netlist(nl)
    ins = {"a[0]": True, "a[1]": True, "b[0]": False, "b[1]": True, "cin": True}
    exp = c.evaluate(c.initialize_wire_map(nl.wire_set, ins))
    assert all(bool(exp[w]) == bool(v) for w, v in got.items())
    assert (watch / "done" / "only.csv").exists()


def test_serve_supervisor_restarts_after_crash(tmp_path):
    """--supervise: the daemon outlives a hard worker death (os._exit via
    the hidden --crash-after hook) and the restarted child finishes the
    remaining inputs — processed files are never re-evaluated."""
    watch = tmp_path / "in"
    outd = tmp_path / "out"
    watch.mkdir()
    for i, bits in enumerate([(1, 0, 1, 0, 0), (0, 1, 1, 1, 1)]):
        a0, a1, b0, b1, cin = bits
        (watch / f"v{i}.csv").write_text(
            f"wire,value\na[0],{a0}\na[1],{a1}\nb[0],{b0}\nb[1],{b1}\ncin,{cin}\n"
        )
    rc = main([
        "-v", "benchmarks/netlists/2-bit-adder.v",
        "--watch", str(watch), "--outdir", str(outd),
        "--test-params", "--batch", "1", "--max-batches", "1",
        "--linger", "0.1", "--poll", "0.05",
        "--supervise", "--crash-after", "1", "--max-restarts", "2",
    ])
    assert rc == 0
    # child 1 finished v0 then hard-exited; the restarted child (crash
    # hook stripped by the supervisor) completed v1 and exited cleanly
    assert (outd / "v0.out.csv").exists()
    assert (outd / "v1.out.csv").exists()
    assert (watch / "done" / "v0.csv").exists()
    assert (watch / "done" / "v1.csv").exists()
    assert not list(watch.glob("*.csv"))


def test_stable_inputs_holds_growing_file(tmp_path):
    """_stable_inputs only releases a file once its (size, mtime) has
    been unchanged for stable_s — a file that grows between scans is
    held, so an in-place slow writer is never read truncated."""
    import time

    from helm_tpu.serve import _stable_inputs

    watch = tmp_path
    cache: dict = {}
    f = watch / "vec.csv"
    f.write_text("wire,value\na[0],1\n")
    # scan 1: first sight — recorded, not eligible
    assert _stable_inputs(str(watch), cache, stable_s=0.2) == []
    # scan 2 immediately: unchanged but not yet stable for 0.2 s
    assert _stable_inputs(str(watch), cache, stable_s=0.2) == []
    # the writer appends: the stability clock must RESET
    time.sleep(0.25)
    with open(f, "a") as fh:
        fh.write("a[1],0\n")
    assert _stable_inputs(str(watch), cache, stable_s=0.2) == []
    # unchanged since the append, but only just re-recorded
    assert _stable_inputs(str(watch), cache, stable_s=0.2) == []
    time.sleep(0.25)
    assert _stable_inputs(str(watch), cache, stable_s=0.2) == ["vec.csv"]
    # zero-byte files are held longer (2 s) than regular stability
    z = watch / "zero.csv"
    z.write_text("")
    assert "zero.csv" not in _stable_inputs(str(watch), cache, stable_s=0.2)
    time.sleep(0.25)
    assert "zero.csv" not in _stable_inputs(str(watch), cache, stable_s=0.2)
    # a processed (removed) file is purged from the cache
    f.unlink()
    _stable_inputs(str(watch), cache, stable_s=0.2)
    assert "vec.csv" not in cache


def test_serve_slowly_written_csv_not_truncated(tmp_path):
    """A CSV written in-place in chunks (0.3 s pauses, slower than the
    poll interval but inside the 0.5 s stability window) is neither read
    truncated nor quarantined — the daemon waits for size-stability,
    then evaluates the complete vector (round-4 verdict, weak item 7b)."""
    import threading
    import time

    watch = tmp_path / "in"
    outd = tmp_path / "out"
    watch.mkdir()
    lines = ["wire,value\n", "a[0],1\n", "a[1],0\n", "b[0],1\n",
             "b[1],1\n", "cin,0\n"]

    def slow_writer():
        with open(watch / "slow.csv", "w") as fh:
            for ln in lines:
                fh.write(ln)
                fh.flush()
                os.fsync(fh.fileno())
                time.sleep(0.3)

    t = threading.Thread(target=slow_writer)
    t.start()
    try:
        rc = main([
            "-v", "benchmarks/netlists/2-bit-adder.v",
            "--watch", str(watch), "--outdir", str(outd),
            "--test-params", "--batch", "1", "--max-batches", "1",
            "--linger", "0.1", "--poll", "0.05",
        ])
    finally:
        t.join()
    assert rc == 0
    assert not (watch / "failed").exists() or not list(
        (watch / "failed").glob("*")
    )
    got = csv_io.read_input_wires(str(outd / "slow.out.csv"), "bool")
    nl = read_verilog_file("benchmarks/netlists/2-bit-adder.v")
    c = Circuit.from_netlist(nl)
    ins = {"a[0]": True, "a[1]": False, "b[0]": True, "b[1]": True,
           "cin": False}
    exp = c.evaluate(c.initialize_wire_map(nl.wire_set, ins))
    assert all(bool(exp[w]) == bool(v) for w, v in got.items())
    assert (watch / "done" / "slow.csv").exists()


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
