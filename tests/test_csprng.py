"""Client-side CSPRNG (fhe/csprng.py): known-answer + distribution tests.

The reference's client layer is tfhe-rs, whose randomness is CSPRNG-backed
throughout (reference: Cargo.toml:18); this suite pins our ChaCha20
implementation to RFC 8439 and checks the derived samplers feed the LWE
paths correctly.
"""

import numpy as np
import pytest

from helm_tpu.fhe.csprng import ChaChaGenerator, chacha20_blocks, make_rng


def test_rfc8439_block_function_kat():
    """RFC 8439 §2.3.2 test vector for the ChaCha20 block function."""
    key = np.frombuffer(bytes(range(32)), dtype="<u4")
    nonce = np.frombuffer(bytes.fromhex("000000090000004a00000000"), dtype="<u4")
    out = chacha20_blocks(key, 1, nonce, 1)[0]
    expect = np.array(
        [0xE4E7F110, 0x15593BD1, 0x1FDD0F50, 0xC47120A3,
         0xC7F4D1C7, 0x0368C033, 0x9AAA2204, 0x4E6CD4C3,
         0x466482D2, 0x09AA9F07, 0x05D7C214, 0xA2028BD9,
         0xD19C12B5, 0xB94E16DE, 0xE883D0CB, 0x4E3C50A2],
        dtype=np.uint32,
    )
    assert (out == expect).all()


def test_vectorized_blocks_match_sequential():
    key = np.frombuffer(bytes(range(32)), dtype="<u4")
    nonce = np.array([7, 8, 9], dtype=np.uint32)
    many = chacha20_blocks(key, 5, nonce, 6)
    for i in range(6):
        one = chacha20_blocks(key, 5 + i, nonce, 1)[0]
        assert (many[i] == one).all()


def test_deterministic_and_stream_separated():
    a = ChaChaGenerator(123).random_u32(100)
    b = ChaChaGenerator(123).random_u32(100)
    c = ChaChaGenerator(124).random_u32(100)
    d = ChaChaGenerator(123, stream=1).random_u32(100)
    assert (a == b).all()
    assert (a != c).any() and (a != d).any()


def test_integers_uniformity():
    g = ChaChaGenerator(42)
    # power-of-two span (mask path): chi-squared over 16 buckets
    v = g.integers(0, 1 << 32, size=160000, dtype=np.uint32)
    counts = np.bincount((v >> np.uint32(28)).astype(int), minlength=16)
    chi2 = ((counts - 10000.0) ** 2 / 10000.0).sum()
    assert chi2 < 50.0, chi2  # df=15, p~1e-5 cutoff
    # binary draw is balanced
    bits = g.integers(0, 2, size=100000, dtype=np.uint32)
    assert abs(bits.mean() - 0.5) < 0.01
    # rejection path (non-power-of-two span) stays in range and uniform-ish
    r = g.integers(0, 1000, size=50000)
    assert r.min() >= 0 and r.max() < 1000
    assert abs(r.mean() - 499.5) < 10.0


def test_normal_moments():
    g = ChaChaGenerator(7)
    e = g.normal(0.0, 128.0, size=400000)
    assert abs(e.mean()) < 1.0
    assert abs(e.std() - 128.0) < 1.0
    # tail sanity: ~2.7e-3 mass beyond 3 sigma
    frac3 = (np.abs(e) > 3 * 128.0).mean()
    assert 1e-3 < frac3 < 5e-3


def test_make_rng_modes(monkeypatch):
    assert isinstance(make_rng(1), ChaChaGenerator)
    monkeypatch.setenv("HELM_TPU_INSECURE_PRNG", "1")
    assert isinstance(make_rng(1), np.random.Generator)


def test_keygen_uses_csprng():
    from helm_tpu import params as P
    from helm_tpu.fhe import lwe

    ck = lwe.keygen(P.TEST_PARAMS, seed=5)
    assert isinstance(ck.rng, ChaChaGenerator)
    ck2 = lwe.keygen(P.TEST_PARAMS, seed=5)
    assert (ck.lwe_key == ck2.lwe_key).all()
    assert (ck.glwe_key == ck2.glwe_key).all()
    assert set(np.unique(ck.lwe_key)) <= {0, 1}
    # encryption round-trips through the CSPRNG masks
    mu = lwe.encode_bool([True, False, True])
    ct = lwe.encrypt(ck, mu)
    assert (lwe.decrypt_phase(ck, ct) == mu).all()
