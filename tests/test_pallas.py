"""Pallas kernel vs jnp pipeline: bit-identical blind rotation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helm_tpu import params as P
from helm_tpu.fhe import lwe, pbs_jnp, server_key
from helm_tpu.ops import pallas_pbs


@pytest.fixture(scope="module")
def keys():
    p = P.TEST_PARAMS
    ck = lwe.keygen(p, seed=21)
    dsk = pbs_jnp.DeviceServerKey.from_host(server_key.gen_server_key(ck))
    return p, ck, dsk


def test_blind_rotate_matches_jnp(keys):
    p, ck, dsk = keys
    G = 8
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, G).astype(bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    ref = np.asarray(jax.jit(pbs_jnp.blind_rotate)(dsk, jnp.asarray(ct), testv))
    got = np.asarray(
        pallas_pbs.blind_rotate_pallas(
            p, dsk.bsk_ntt, dsk.bsk_ntt_sh, jnp.asarray(ct), testv,
            g_tile=4, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_bootstrap_pallas_truth_table(keys):
    p, ck, dsk = keys
    combos = [(a, b) for a in (False, True) for b in (False, True)]
    c1 = lwe.encrypt(ck, lwe.encode_bool([a for a, _ in combos]))
    c2 = lwe.encrypt(ck, lwe.encode_bool([b for _, b in combos]))
    q8 = 1 << 29
    lin = (c1 + c2).astype(np.uint32)
    lin[:, p.n] += np.uint32((-q8) % (1 << 32))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    out = np.asarray(
        pallas_pbs.bootstrap_pallas(
            dsk, jnp.asarray(lin), testv, g_tile=4, interpret=True
        )
    )
    got = list(lwe.decode_bool(lwe.decrypt_phase(ck, out)))
    assert got == [a and b for a, b in combos]


def test_pallas_ragged_batch(keys):
    """G not divisible by g_tile: padding path."""
    p, ck, dsk = keys
    G = 5
    bits = np.array([1, 0, 1, 1, 0], bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    ref = np.asarray(jax.jit(pbs_jnp.blind_rotate)(dsk, jnp.asarray(ct), testv))
    got = np.asarray(
        pallas_pbs.blind_rotate_pallas(
            p, dsk.bsk_ntt, dsk.bsk_ntt_sh, jnp.asarray(ct), testv,
            g_tile=4, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_mxu_blind_rotate_matches_jnp(keys):
    from helm_tpu.ops import mxu_pbs

    p, ck, dsk = keys
    G = 8
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, G).astype(bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    ref = np.asarray(jax.jit(pbs_jnp.blind_rotate)(dsk, jnp.asarray(ct), testv))
    bsk_mxu, bsk_mxu_sh = mxu_pbs.mxu_server_key(dsk)
    got = np.asarray(
        mxu_pbs.blind_rotate_mxu(
            p, bsk_mxu, bsk_mxu_sh, jnp.asarray(ct), testv,
            g_tile=4, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_mxu_bootstrap_truth_table(keys):
    from helm_tpu.ops import mxu_pbs

    p, ck, dsk = keys
    combos = [(a, b) for a in (False, True) for b in (False, True)]
    c1 = lwe.encrypt(ck, lwe.encode_bool([a for a, _ in combos]))
    c2 = lwe.encrypt(ck, lwe.encode_bool([b for _, b in combos]))
    lin = (c1 + c2).astype(np.uint32)
    lin[:, p.n] += np.uint32((-(1 << 29)) % (1 << 32))
    out = np.asarray(
        mxu_pbs.bootstrap_mxu(
            dsk, jnp.asarray(lin), jnp.asarray(pbs_jnp.gates_test_poly(p)),
            g_tile=4, interpret=True,
        )
    )
    got = list(lwe.decode_bool(lwe.decrypt_phase(ck, out)))
    assert got == [a and b for a, b in combos]


@pytest.fixture(
    scope="module", params=["mb2", "mb4"]
)
def keys_mb(request):
    p = P.TEST_PARAMS_MB if request.param == "mb2" else P.TEST_PARAMS_MB4
    ck = lwe.keygen(p, seed=31)
    dsk = pbs_jnp.DeviceServerKey.from_host(server_key.gen_server_key(ck))
    return p, ck, dsk


def test_mxu_multibit_blind_rotate_matches_jnp(keys_mb):
    """Multi-bit MXU kernel bit-equals the jnp multi-bit reference."""
    from helm_tpu.ops import mxu_pbs

    p, ck, dsk = keys_mb
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, 8).astype(bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    ref = np.asarray(
        jax.jit(pbs_jnp.blind_rotate_multibit)(dsk, jnp.asarray(ct), testv)
    )
    bsk_mxu, bsk_mxu_sh = mxu_pbs.mxu_server_key(dsk)
    got = np.asarray(
        mxu_pbs.blind_rotate_mxu_mb(
            p, bsk_mxu, bsk_mxu_sh, jnp.asarray(ct), testv,
            g_tile=4, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_fs_multibit_blind_rotate_matches_jnp(keys_mb):
    """Frequency-in-sublanes multi-bit kernel bit-equals the jnp reference."""
    from helm_tpu.ops import mxu_pbs

    p, ck, dsk = keys_mb
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, 8).astype(bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    ref = np.asarray(
        jax.jit(pbs_jnp.blind_rotate_multibit)(dsk, jnp.asarray(ct), testv)
    )
    bsk_fs = mxu_pbs.mxu_server_key_fs(dsk)
    got = np.asarray(
        mxu_pbs.blind_rotate_fs_mb(
            p, bsk_fs, jnp.asarray(ct), testv,
            g_tile=8, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)
    # VMEM-pressure variants (per-prime digit recompute, accumulated CRT)
    # must stay bit-identical — they only reorder/duplicate computation
    for ab in ("digrec", "crtacc", "digrec,crtacc"):
        got = np.asarray(
            mxu_pbs.blind_rotate_fs_mb(
                p, bsk_fs, jnp.asarray(ct), testv,
                g_tile=8, interpret=True, ablate=ab,
            )
        )
        np.testing.assert_array_equal(got, ref, err_msg=ab)


def test_mxu_multibit_bootstrap_truth_table(keys_mb):
    from helm_tpu.ops import mxu_pbs

    p, ck, dsk = keys_mb
    combos = [(a, b) for a in (False, True) for b in (False, True)]
    c1 = lwe.encrypt(ck, lwe.encode_bool([a for a, _ in combos]))
    c2 = lwe.encrypt(ck, lwe.encode_bool([b for _, b in combos]))
    lin = (c1 + c2).astype(np.uint32)
    lin[:, p.n] += np.uint32((-(1 << 29)) % (1 << 32))
    out = np.asarray(
        mxu_pbs.bootstrap_mxu(
            dsk, jnp.asarray(lin), jnp.asarray(pbs_jnp.gates_test_poly(p)),
            g_tile=4, interpret=True,
        )
    )
    got = list(lwe.decode_bool(lwe.decrypt_phase(ck, out)))
    assert got == [a and b for a, b in combos]


@pytest.fixture(scope="module")
def keys_n2048():
    """Tiny-n set on the N=2048 ring: its prime set includes 65537, whose
    balanced residues reach +-2^15 (hi limb exactly 128 — the int16-limb /
    bf16-exact boundary case for the MXU matmul path)."""
    p = P.TfheParams(
        name="test_tiny_n2048",
        n=8,
        k=1,
        N=2048,
        pbs_base_log=8,
        pbs_level=2,
        ks_base_log=4,
        ks_level=4,
        lwe_noise_std=0.0,
        glwe_noise_std=0.0,
        msg_space_log=5,
        message_bits=2,
    )
    ck = lwe.keygen(p, seed=43)
    dsk = pbs_jnp.DeviceServerKey.from_host(server_key.gen_server_key(ck))
    return p, ck, dsk


def test_mxu_blind_rotate_n2048_matches_jnp(keys_n2048):
    from helm_tpu.ops import mxu_pbs

    p, ck, dsk = keys_n2048
    bits = np.array([1, 0, 1, 1, 0, 0, 1, 0], bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    ref = np.asarray(jax.jit(pbs_jnp.blind_rotate)(dsk, jnp.asarray(ct), testv))
    bsk_mxu, bsk_mxu_sh = mxu_pbs.mxu_server_key(dsk)
    got = np.asarray(
        mxu_pbs.blind_rotate_mxu(
            p, bsk_mxu, bsk_mxu_sh, jnp.asarray(ct), testv,
            g_tile=1, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_fs_multibit_n2048_matches_jnp(keys_n2048):
    from helm_tpu.ops import mxu_pbs

    p = P.TfheParams(
        name="test_tiny_mb2_n2048",
        n=8,
        k=1,
        N=2048,
        pbs_base_log=8,
        pbs_level=2,
        ks_base_log=4,
        ks_level=4,
        lwe_noise_std=0.0,
        glwe_noise_std=0.0,
        msg_space_log=5,
        message_bits=2,
        grouping=2,
    )
    ck = lwe.keygen(p, seed=44)
    dsk = pbs_jnp.DeviceServerKey.from_host(server_key.gen_server_key(ck))
    bits = np.array([0, 1, 1, 0, 1, 0, 0, 1], bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    ref = np.asarray(
        jax.jit(pbs_jnp.blind_rotate_multibit)(dsk, jnp.asarray(ct), testv)
    )
    bsk_fs = mxu_pbs.mxu_server_key_fs(dsk)
    got = np.asarray(
        mxu_pbs.blind_rotate_fs_mb(
            p, bsk_fs, jnp.asarray(ct), testv, g_tile=8, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_ts_multibit_blind_rotate_matches_jnp(keys_mb):
    """Transposed-packed multi-bit kernel bit-equals the jnp reference
    (gates in sublanes, tile pairs in lanes — see ops/ts_pbs.py)."""
    from helm_tpu.ops import ts_pbs

    p, ck, dsk = keys_mb
    rng = np.random.default_rng(13)
    bits = rng.integers(0, 2, 8).astype(bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    ref = np.asarray(
        jax.jit(pbs_jnp.blind_rotate_multibit)(dsk, jnp.asarray(ct), testv)
    )
    bsk_ts = ts_pbs.mxu_server_key_ts(dsk)
    got = np.asarray(
        ts_pbs.blind_rotate_ts_mb(
            p, bsk_ts, jnp.asarray(ct), testv,
            g_tile=8, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_ts_multibit_per_gate_testv_and_ragged(keys_mb):
    """ts kernel with a per-gate test-poly bank and a non-tile-multiple
    batch (padding path) bit-equals the jnp reference."""
    from helm_tpu.ops import ts_pbs

    p, ck, dsk = keys_mb
    rng = np.random.default_rng(17)
    G = 11  # not a multiple of g_tile=8: exercises padding
    bits = rng.integers(0, 2, G).astype(bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    base = np.asarray(pbs_jnp.gates_test_poly(p))
    tvs = np.stack([np.roll(base[0], i) for i in range(G)])
    ref = np.asarray(
        jax.jit(pbs_jnp.blind_rotate_multibit)(
            dsk, jnp.asarray(ct), jnp.asarray(tvs)
        )
    )
    bsk_ts = ts_pbs.mxu_server_key_ts(dsk)
    got = np.asarray(
        ts_pbs.blind_rotate_ts_mb(
            p, bsk_ts, jnp.asarray(ct), jnp.asarray(tvs),
            g_tile=8, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_hb_multibit_blind_rotate_matches_jnp(keys_mb):
    """HYBRID kernel (fs transforms + ts-oriented pointwise,
    blind_rotate_fs_mb(tsptw=True)) bit-equals the jnp reference."""
    from helm_tpu.ops import mxu_pbs, ts_pbs

    p, ck, dsk = keys_mb
    rng = np.random.default_rng(23)
    bits = rng.integers(0, 2, 8).astype(bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    ref = np.asarray(
        jax.jit(pbs_jnp.blind_rotate_multibit)(dsk, jnp.asarray(ct), testv)
    )
    bsk_ts = ts_pbs.mxu_server_key_ts(dsk)
    got = np.asarray(
        mxu_pbs.blind_rotate_fs_mb(
            p, bsk_ts, jnp.asarray(ct), testv,
            g_tile=8, interpret=True, tsptw=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_hb_multibit_k3_matches_fs():
    """Hybrid kernel bit-equals the fs kernel at a k=3 geometry (the
    GATES_128_K3 deployment shape) including the padding path."""
    from helm_tpu.ops import mxu_pbs, ts_pbs

    p = P.TEST_PARAMS_K3
    ck = lwe.keygen(p, seed=51)
    dsk = pbs_jnp.DeviceServerKey.from_host(server_key.gen_server_key(ck))
    rng = np.random.default_rng(29)
    G = 11  # not a multiple of g_tile=8: exercises padding
    bits = rng.integers(0, 2, G).astype(bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    ref = np.asarray(
        mxu_pbs.blind_rotate_fs_mb(
            p, mxu_pbs.mxu_server_key_fs(dsk), jnp.asarray(ct), testv,
            g_tile=8, interpret=True,
        )
    )
    got = np.asarray(
        mxu_pbs.blind_rotate_fs_mb(
            p, ts_pbs.mxu_server_key_ts(dsk), jnp.asarray(ct), testv,
            g_tile=8, interpret=True, tsptw=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_fs16_matches_fs():
    """int16-BSK fs variant (mxu_server_key_fs_i16) bit-equals the f32-BSK
    fs kernel at the k=3 geometry — same values, half the splat bytes
    (round-4 splat-traffic A/B)."""
    from helm_tpu.ops import mxu_pbs

    p = P.TEST_PARAMS_K3
    ck = lwe.keygen(p, seed=51)
    dsk = pbs_jnp.DeviceServerKey.from_host(server_key.gen_server_key(ck))
    rng = np.random.default_rng(29)
    bits = rng.integers(0, 2, 11).astype(bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    ref = np.asarray(
        mxu_pbs.blind_rotate_fs_mb(
            p, mxu_pbs.mxu_server_key_fs(dsk), jnp.asarray(ct), testv,
            g_tile=8, interpret=True,
        )
    )
    bsk16 = mxu_pbs.mxu_server_key_fs_i16(dsk)
    assert bsk16.dtype == jnp.int16
    got = np.asarray(
        mxu_pbs.blind_rotate_fs_mb(
            p, bsk16, jnp.asarray(ct), testv, g_tile=8, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow  # perf-variant A/B: ~3 min of XLA:CPU compiles
def test_fold_matches_fs():
    """The `fold` restructure (subset combination fused into the (v, c2)
    pointwise loop — drops the 24 stored S arrays from the live set)
    bit-equals the unfused fs kernel at the k=3 geometry: identical FP
    ops and operand association, only the emission order differs."""
    from helm_tpu.ops import mxu_pbs

    p = P.TEST_PARAMS_K3
    ck = lwe.keygen(p, seed=51)
    dsk = pbs_jnp.DeviceServerKey.from_host(server_key.gen_server_key(ck))
    rng = np.random.default_rng(29)
    bits = rng.integers(0, 2, 11).astype(bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    bsk = mxu_pbs.mxu_server_key_fs(dsk)
    ref = np.asarray(
        mxu_pbs.blind_rotate_fs_mb(
            p, bsk, jnp.asarray(ct), testv, g_tile=8, interpret=True,
            ablate="nofold",
        )
    )
    got = np.asarray(
        mxu_pbs.blind_rotate_fs_mb(
            p, bsk, jnp.asarray(ct), testv, g_tile=8, interpret=True,
            ablate="fold",
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_hb_blimb_matches_fs():
    """Hybrid kernel with host-precomputed BSK limb-pair rows (blimb,
    mxu_server_key_hb2) bit-equals the fs kernel — the fwd rows are
    consumed unsplit but S decomposes to the same mod-p value."""
    from helm_tpu.ops import mxu_pbs, ts_pbs

    p = P.TEST_PARAMS_K3
    ck = lwe.keygen(p, seed=51)
    dsk = pbs_jnp.DeviceServerKey.from_host(server_key.gen_server_key(ck))
    rng = np.random.default_rng(29)
    bits = rng.integers(0, 2, 11).astype(bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    ref = np.asarray(
        mxu_pbs.blind_rotate_fs_mb(
            p, mxu_pbs.mxu_server_key_fs(dsk), jnp.asarray(ct), testv,
            g_tile=8, interpret=True,
        )
    )
    bsk2 = ts_pbs.mxu_server_key_hb2(dsk)
    for ab in ("blimb", "blimb,implrow"):
        got = np.asarray(
            mxu_pbs.blind_rotate_fs_mb(
                p, bsk2, jnp.asarray(ct), testv,
                g_tile=8, interpret=True, tsptw=True, ablate=ab,
            )
        )
        np.testing.assert_array_equal(got, ref)


@pytest.mark.slow  # perf-variant A/B: ~3 min of XLA:CPU compiles
def test_halfg_matches_fs():
    """The `halfg` probe (r-sum emitted per lane half-tile: identical
    elementwise ops on disjoint [N2, G/2] slices, half the per-value
    vreg footprint) bit-equals the full-width fs kernel."""
    from helm_tpu.ops import mxu_pbs

    p = P.TEST_PARAMS_K3
    ck = lwe.keygen(p, seed=51)
    dsk = pbs_jnp.DeviceServerKey.from_host(server_key.gen_server_key(ck))
    rng = np.random.default_rng(29)
    bits = rng.integers(0, 2, 11).astype(bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    bsk = mxu_pbs.mxu_server_key_fs(dsk)
    ref = np.asarray(
        mxu_pbs.blind_rotate_fs_mb(
            p, bsk, jnp.asarray(ct), testv, g_tile=8, interpret=True,
        )
    )
    got = np.asarray(
        mxu_pbs.blind_rotate_fs_mb(
            p, bsk, jnp.asarray(ct), testv, g_tile=8, interpret=True,
            ablate="halfg",
        )
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow  # perf-variant A/B: ~3 min of XLA:CPU compiles
def test_ps_matches_fs():
    """The prime-split kernel (CRT primes on the grid, per-prime SMEM
    scalars, staged digits + running CRT partial sums) bit-equals the fs
    kernel at the k=3 geometry — the round-5 emergent-program-size
    restructure (PERFORMANCE.md)."""
    from helm_tpu.ops import mxu_pbs

    p = P.TEST_PARAMS_K3
    ck = lwe.keygen(p, seed=51)
    dsk = pbs_jnp.DeviceServerKey.from_host(server_key.gen_server_key(ck))
    rng = np.random.default_rng(29)
    bits = rng.integers(0, 2, 11).astype(bool)
    ct = lwe.encrypt(ck, lwe.encode_bool(bits))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    ref = np.asarray(
        mxu_pbs.blind_rotate_fs_mb(
            p, mxu_pbs.mxu_server_key_fs(dsk), jnp.asarray(ct), testv,
            g_tile=8, interpret=True,
        )
    )
    got = np.asarray(
        mxu_pbs.blind_rotate_fs_ps(
            p, mxu_pbs.mxu_server_key_ps(dsk), jnp.asarray(ct), testv,
            g_tile=8, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)
