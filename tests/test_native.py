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
    ("benchmarks/netlists/128-bit-mult.v", False),
    ("benchmarks/netlists/s15850-like.v", False),
    ("benchmarks/netlists/mmult15_arith.v", True),
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


# --- native data loader (native/loader.cpp) -------------------------------


def test_native_loader_csv_parity():
    from helm_tpu.io import csv_io, native_loader

    if not native_loader.native_available():
        pytest.skip("native/libhelm_loader.so not built")
    cases = [
        ("benchmarks/test-cases/2-bit-adder.inputs.csv", "bool"),
        ("benchmarks/test-cases/s27.inputs.csv", "bool"),
        ("benchmarks/test-cases/8-bit-adder.inputs.csv", "bool"),
        ("benchmarks/test-cases/chi_squared_arith_1.inputs.csv", "u32"),
        ("benchmarks/test-cases/chi_squared_arith_2.inputs.csv", "u16"),
    ]
    for path, t in cases:
        assert native_loader.read_input_wires(path, t) == csv_io.read_input_wires(path, t), path


def test_native_loader_hex_width_expansion(tmp_path):
    from helm_tpu.io import csv_io, native_loader

    if not native_loader.native_available():
        pytest.skip("native/libhelm_loader.so not built")
    f = tmp_path / "in.csv"
    f.write_text("wire, value\nin3, 5A, 8\nflag, true\nz, 0\n")
    assert native_loader.read_input_wires(str(f), "bool") == csv_io.read_input_wires(str(f), "bool")


def test_native_loader_batch_encrypt_roundtrip():
    """Threaded C++ LWE encryption decrypts correctly and hits the
    requested noise level (same contract as fhe/lwe.encrypt)."""
    import numpy as np

    from helm_tpu import params as P
    from helm_tpu.fhe import lwe
    from helm_tpu.io import native_loader

    if not native_loader.native_available():
        pytest.skip("native/libhelm_loader.so not built")
    p = P.GATES_TPU
    ck = lwe.keygen(p, seed=11)
    bits = np.random.default_rng(1).integers(0, 2, 2048).astype(bool)
    mu = lwe.encode_bool(bits)
    ct = native_loader.encrypt_batch(ck.lwe_key, mu, p.lwe_noise_std, seed=3)
    assert ct.shape == (2048, p.n + 1) and ct.dtype == np.uint32
    assert (lwe.decode_bool(lwe.decrypt_phase(ck, ct)) == bits).all()
    ph = lwe.decrypt_phase(ck, ct).astype(np.int64)
    err = ((ph - mu.astype(np.int64) + 2**31) % 2**32) - 2**31
    assert 0.7 * p.lwe_noise_std < err.std() < 1.3 * p.lwe_noise_std
    # noiseless + fixed seed is deterministic
    a = native_loader.encrypt_batch(ck.lwe_key, mu[:4], 0.0, seed=9)
    b = native_loader.encrypt_batch(ck.lwe_key, mu[:4], 0.0, seed=9)
    assert (a == b).all()


def test_native_loader_nthreads_invariant():
    """Seeded output is identical for every nthreads value and for the
    single-thread small-batch path (streams are keyed by fixed row
    blocks, not thread index — seeded runs must be reproducible)."""
    import numpy as np

    from helm_tpu import params as P
    from helm_tpu.fhe import lwe
    from helm_tpu.io import native_loader

    if not native_loader.native_available():
        pytest.skip("native/libhelm_loader.so not built")
    p = P.GATES_TPU
    ck = lwe.keygen(p, seed=12)
    # > 2 stream blocks so the atomic block walk is exercised
    mu = np.random.default_rng(5).integers(
        0, 1 << 32, 2500, dtype=np.uint64
    ).astype(np.uint32)
    ref = native_loader.encrypt_batch(ck.lwe_key, mu, 3.5, seed=21, nthreads=1)
    for nt in (2, 7, 0):
        got = native_loader.encrypt_batch(
            ck.lwe_key, mu, 3.5, seed=21, nthreads=nt
        )
        assert np.array_equal(ref, got), f"nthreads={nt} changed ciphertexts"
    # prefix stability: a smaller batch is a prefix of the larger one
    small = native_loader.encrypt_batch(
        ck.lwe_key, mu[:40], 3.5, seed=21, nthreads=4
    )
    assert np.array_equal(ref[:40], small)
