"""Unit tests for the persistent AOT executable cache (helm_tpu/aot_cache.py).

The production win is on TPU (the axon plugin never persists Mosaic
executables — ROADMAP #3); these tests exercise the full
serialize→disk→deserialize machinery on the CPU backend with FORCE so
the default suite covers dispatch, keying, donation, and fallback
without a chip. tools/tpu_queue scripts re-verify warm-start on-chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helm_tpu import aot_cache
from helm_tpu.aot_cache import CachedJit, cached_jit


@pytest.fixture
def forced_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("HELM_TPU_AOT_CACHE", str(tmp_path))
    monkeypatch.setattr(aot_cache, "FORCE", [True])
    monkeypatch.setattr(aot_cache, "MIN_STORE_SECS", [0.0])
    before = dict(aot_cache.stats)
    yield tmp_path
    for k, v in before.items():
        aot_cache.stats[k] = v


def _delta(before):
    return {k: aot_cache.stats[k] - before[k] for k in before}


def test_roundtrip_and_disk_hit(forced_cache):
    def fn(a, b):
        return {"s": a * 2 + b, "d": a - b}

    a = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    b = jnp.ones((3, 4), jnp.float32)
    before = dict(aot_cache.stats)
    cj = CachedJit(fn, name="t_roundtrip")
    out = cj(a, b)
    assert np.array_equal(out["s"], np.asarray(a) * 2 + 1)
    assert _delta(before)["misses"] == 1 and _delta(before)["stores"] == 1
    assert list(forced_cache.glob("t_roundtrip-*.pjrt"))

    # same instance, same shapes: in-memory memo, no new compile
    out2 = cj(a + 1, b)
    assert np.array_equal(out2["d"], np.asarray(a) + 1 - 1)
    assert _delta(before)["misses"] == 1

    # fresh instance (= fresh process): loads from disk, bit-identical
    cj2 = CachedJit(fn, name="t_roundtrip")
    out3 = cj2(a, b)
    assert np.array_equal(out3["s"], np.asarray(out["s"]))
    d = _delta(before)
    assert d["hits"] == 1 and d["misses"] == 1 and d["errors"] == 0


def test_static_args_and_kwargs(forced_cache):
    @cached_jit(static_argnums=(0,), static_argnames=("scale",), name="t_static")
    def fn(k, x, scale=1):
        return x * k * scale

    x = jnp.arange(8, dtype=jnp.int32)
    assert np.array_equal(fn(3, x, scale=2), np.arange(8) * 6)
    assert np.array_equal(fn(5, x, scale=2), np.arange(8) * 10)  # new static
    before = dict(aot_cache.stats)
    assert np.array_equal(fn(3, x, scale=2), np.arange(8) * 6)  # memo hit
    assert _delta(before)["misses"] == 0


def test_shape_change_recompiles(forced_cache):
    cj = CachedJit(lambda x: x + 1, name="t_shape")
    before = dict(aot_cache.stats)
    cj(jnp.zeros((4,), jnp.float32))
    cj(jnp.zeros((8,), jnp.float32))
    assert _delta(before)["misses"] == 2


def test_donation(forced_cache):
    cj = CachedJit(lambda x: x + 1, donate_argnums=(0,), name="t_donate")
    x = jnp.zeros((16,), jnp.float32)
    out = cj(x)
    assert np.array_equal(out, np.ones(16, np.float32))
    assert x.is_deleted()
    # fresh instance deserializes; donation still honored
    x2 = jnp.full((16,), 3.0, jnp.float32)
    out2 = CachedJit(lambda x: x + 1, donate_argnums=(0,), name="t_donate")(x2)
    assert np.array_equal(out2, np.full(16, 4.0, np.float32))
    assert x2.is_deleted()


def test_corrupt_entry_falls_back(forced_cache):
    def fn(x):
        return x * 3

    x = jnp.arange(6, dtype=jnp.float32)
    CachedJit(fn, name="t_corrupt")(x)
    (entry,) = forced_cache.glob("t_corrupt-*.pjrt")
    entry.write_bytes(b"not an executable")
    before = dict(aot_cache.stats)
    with pytest.warns(UserWarning, match="unusable"):
        out = CachedJit(fn, name="t_corrupt")(x)
    assert np.array_equal(out, np.arange(6) * 3.0)
    d = _delta(before)
    assert d["errors"] == 1 and d["misses"] == 1


def test_tampered_entry_fails_closed(forced_cache):
    """A bit-flip anywhere in the framed entry must fail the sha256 check
    (ValueError inside the loader -> warn + recompile), never reach the
    PJRT deserializer, and never involve pickle."""
    def fn(x):
        return x + 7

    x = jnp.arange(5, dtype=jnp.float32)
    CachedJit(fn, name="t_tamper")(x)
    (entry,) = forced_cache.glob("t_tamper-*.pjrt")
    raw = bytearray(entry.read_bytes())
    assert raw.startswith(aot_cache._MAGIC)
    raw[-1] ^= 0xFF  # flip a payload bit; digest no longer matches
    entry.write_bytes(bytes(raw))
    before = dict(aot_cache.stats)
    with pytest.warns(UserWarning, match="checksum mismatch"):
        out = CachedJit(fn, name="t_tamper")(x)
    assert np.array_equal(out, np.arange(5) + 7.0)
    d = _delta(before)
    assert d["errors"] == 1 and d["misses"] == 1


def test_entry_format_is_not_pickle(forced_cache):
    """Entries are framed bytes (magic + digest + body); a malicious
    pickle dropped in the cache dir is rejected at the magic check."""
    import pickle

    CachedJit(lambda x: x * 2, name="t_fmt")(jnp.ones(3))
    (entry,) = forced_cache.glob("t_fmt-*.pjrt")
    data = entry.read_bytes()
    assert data.startswith(aot_cache._MAGIC)
    payload, ids = aot_cache._unpack_entry(data)
    assert isinstance(payload, bytes) and all(isinstance(i, int) for i in ids)
    # a pickle bomb in the entry's place is refused before deserialization
    entry.write_bytes(pickle.dumps({"payload": b"boom", "device_ids": [0]}))
    with pytest.warns(UserWarning, match="bad magic"):
        out = CachedJit(lambda x: x * 2, name="t_fmt")(jnp.ones(3))
    assert np.array_equal(out, np.full(3, 2.0))


def test_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("HELM_TPU_AOT_CACHE", "")
    monkeypatch.setattr(aot_cache, "FORCE", [True])
    before = dict(aot_cache.stats)
    out = CachedJit(lambda x: x - 1, name="t_off")(jnp.ones(4))
    assert np.array_equal(out, np.zeros(4))
    assert _delta(before) == {k: 0 for k in before}


def test_engine_seam_unchanged_on_cpu():
    """The boolean engine's cached seams must behave as plain jit on CPU
    (FORCE off): run the 2-bit adder end to end at test params."""
    from helm_tpu import params as P
    from helm_tpu.circuit.graph import Circuit
    from helm_tpu.circuit.verilog import read_verilog_file
    from helm_tpu.engines.boolean import BooleanEngine
    from helm_tpu.io import csv_io

    nl = read_verilog_file("benchmarks/netlists/2-bit-adder.v")
    inputs = csv_io.read_input_wires(
        "benchmarks/test-cases/2-bit-adder.inputs.csv", "bool"
    )
    c = Circuit.from_netlist(nl)
    exp = c.evaluate(c.initialize_wire_map(nl.wire_set, inputs))
    eng = BooleanEngine(mode="gates", params=P.TEST_PARAMS, seed=7)
    eng.compile(nl)
    got = eng.decrypt_outputs(eng.evaluate(eng.encrypt_inputs(inputs)))
    for w, v in got.items():
        assert exp[w] == v, w


def test_unsafe_cache_dir_disables(tmp_path, monkeypatch):
    """A group/other-writable cache dir owned by us is tightened; one we
    cannot tighten-or-trust disables persistence (fails open to
    recompiling, never to loading from the dir)."""
    import os

    d = tmp_path / "aot"
    d.mkdir()
    os.chmod(d, 0o777)
    monkeypatch.setenv("HELM_TPU_AOT_CACHE", str(d))
    # ours + loose: tightened in place and accepted
    assert aot_cache._cache_dir() == str(d)
    assert (os.stat(d).st_mode & 0o022) == 0
    # simulate a dir we cannot trust (not ours): patch geteuid
    monkeypatch.setattr(os, "geteuid", lambda: os.stat(d).st_uid + 1)
    with pytest.warns(UserWarning, match="writable by other users"):
        assert aot_cache._cache_dir() is None
