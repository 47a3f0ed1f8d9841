"""Core TFHE pipeline tests on tiny noise-free parameters (exact)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helm_tpu import params as P
from helm_tpu.fhe import lwe, ops, pbs_jnp, server_key
from helm_tpu.fhe.modring import get_tables
from helm_tpu.fhe.ntt import negacyclic_mul_u32


def test_decompose_recompose(rng):
    v = rng.integers(0, 1 << 32, size=1000, dtype=np.uint32)
    for bl, lv in [(7, 3), (2, 8), (8, 2), (4, 4)]:
        d = ops.signed_decompose(np, v, bl, lv)
        assert int(np.abs(d).max()) <= (1 << bl) // 2
        back = ops.recompose(np, d, bl, lv)
        err = (back - v).astype(np.int64)
        err = np.minimum(err % (1 << 32), (-err) % (1 << 32))
        assert int(err.max()) <= 1 << (32 - bl * lv - 1)


def test_negacyclic_rotate_matches_monomial(rng):
    N = 64
    tab = get_tables(N)
    x = rng.integers(0, 1 << 32, size=(5, N), dtype=np.uint32)
    for r in [0, 1, 17, N - 1, N, N + 5, 2 * N - 1]:
        mono = np.zeros(N, dtype=np.uint32)
        if r < N:
            mono[r] = 1
            exp = negacyclic_mul_u32(np, x, mono, tab)
        else:
            mono[r - N] = 1
            exp = (0 - negacyclic_mul_u32(np, x, mono, tab)).astype(np.uint32)
        rr = np.full((5,), r, dtype=np.uint32)
        got = ops.negacyclic_rotate(np, x, rr, N)
        np.testing.assert_array_equal(got, exp)


def test_encrypt_decrypt_roundtrip():
    p = P.TEST_PARAMS
    ck = lwe.keygen(p, seed=7)
    bits = np.array([True, False, True, True])
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    assert ct.shape == (4, p.n + 1)
    ph = lwe.decrypt_phase(ck, ct)
    np.testing.assert_array_equal(lwe.decode_bool(ph), bits)
    # big-key encrypt/decrypt
    mu = lwe.encode_msg(p, np.arange(4) % p.msg_space)
    ct2 = lwe.encrypt(ck, mu, big=True)
    ph2 = lwe.decrypt_phase(ck, ct2, big=True)
    np.testing.assert_array_equal(ph2, mu)


def test_sample_extract_consistency(rng):
    """Extracting a trivial-mask GLWE: phase of big LWE == poly coeff 0."""
    p = P.TEST_PARAMS
    ck = lwe.keygen(p, seed=3)
    tab = get_tables(p.N)
    # GLWE encryption of a known poly, done by hand
    msg = rng.integers(0, 1 << 32, size=p.N, dtype=np.uint32)
    a = ck.rng.integers(0, 1 << 32, size=(p.k, p.N), dtype=np.uint32)
    body = msg.copy()
    for c in range(p.k):
        body += negacyclic_mul_u32(np, a[c], ck.glwe_key[c], tab)
    acc = np.concatenate([a, body[None]], axis=0)[None]  # [1, k+1, N]
    big = ops.sample_extract(np, acc, p.k, p.N)
    ph = lwe.decrypt_phase(ck, big, big=True)
    assert ph[0] == msg[0]


@pytest.fixture(scope="module")
def tiny_keys():
    p = P.TEST_PARAMS
    ck = lwe.keygen(p, seed=42)
    sk = server_key.gen_server_key(ck)
    dsk = pbs_jnp.DeviceServerKey.from_host(sk)
    return p, ck, dsk


def test_keyswitch(tiny_keys):
    p, ck, dsk = tiny_keys
    mu = lwe.encode_msg(p, np.arange(8) % (p.msg_space // 2))
    big = lwe.encrypt(ck, mu, big=True)
    small = np.asarray(jax.jit(pbs_jnp.keyswitch)(dsk, jnp.asarray(big)))
    ph = lwe.decrypt_phase(ck, small)
    np.testing.assert_array_equal(lwe.decode_msg(p, ph), mu // p.delta)


def test_gate_bootstrap_truth_tables(tiny_keys):
    p, ck, dsk = tiny_keys
    q8 = np.uint32(1 << 29)
    combos = [(a, b) for a in (False, True) for b in (False, True)]
    c1 = lwe.encrypt(ck, lwe.encode_bool([a for a, _ in combos]))
    c2 = lwe.encrypt(ck, lwe.encode_bool([b for _, b in combos]))
    lin = {
        "and": c1 + c2 - lwe.trivial(p, np.full(4, q8)),
        "or": c1 + c2 + lwe.trivial(p, np.full(4, q8)),
        "nand": (0 - (c1 + c2)) + lwe.trivial(p, np.full(4, q8)),
        "nor": (0 - (c1 + c2)) - lwe.trivial(p, np.full(4, q8)),
        "xor": 2 * (c1 + c2) + lwe.trivial(p, np.full(4, 2 * q8)),
        "xnor": (0 - 2 * (c1 + c2)) - lwe.trivial(p, np.full(4, 2 * q8)),
    }
    expect = {
        "and": [a and b for a, b in combos],
        "or": [a or b for a, b in combos],
        "nand": [not (a and b) for a, b in combos],
        "nor": [not (a or b) for a, b in combos],
        "xor": [a != b for a, b in combos],
        "xnor": [a == b for a, b in combos],
    }
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    bs = jax.jit(pbs_jnp.bootstrap)
    for gate, ct in lin.items():
        out = np.asarray(bs(dsk, jnp.asarray(ct.astype(np.uint32)), testv))
        got = lwe.decode_bool(lwe.decrypt_phase(ck, out))
        assert list(got) == expect[gate], gate


def test_programmable_lut_bootstrap():
    p = P.TEST_PARAMS_LUT
    ck = lwe.keygen(p, seed=11)
    dsk = pbs_jnp.DeviceServerKey.from_host(server_key.gen_server_key(ck))
    rng = np.random.default_rng(5)
    table = rng.integers(0, p.msg_space // 2, size=p.msg_space // 2, dtype=np.uint64)
    msgs = np.arange(p.msg_space // 2)
    ct = lwe.encrypt(ck, lwe.encode_msg(p, msgs))
    testv = jnp.asarray(pbs_jnp.lut_test_poly(p, table))[None, :]
    out = np.asarray(jax.jit(pbs_jnp.bootstrap)(dsk, jnp.asarray(ct), testv))
    got = lwe.decode_msg(p, lwe.decrypt_phase(ck, out))
    np.testing.assert_array_equal(got, table[msgs])
