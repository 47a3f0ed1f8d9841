"""NTT correctness: exact negacyclic products mod 2^32 vs schoolbook."""

import numpy as np
import pytest

from helm_tpu.fhe import modring, ntt


def naive_negacyclic_u32(a, b):
    """Schoolbook negacyclic product mod 2^32 via Python ints (exact)."""
    N = len(a)
    out = [0] * N
    for i in range(N):
        ai = int(a[i])
        if ai >= 1 << 31:
            ai -= 1 << 32
        for j in range(N):
            bj = int(b[j])
            if bj >= 1 << 31:
                bj -= 1 << 32
            k = i + j
            if k < N:
                out[k] += ai * bj
            else:
                out[k - N] -= ai * bj
    return np.array([v % (1 << 32) for v in out], dtype=np.uint32)


@pytest.mark.parametrize("N", [8, 64, 256])
def test_roundtrip_numpy(N, rng):
    tab = modring.get_tables(N)
    x = rng.integers(0, 1 << 32, size=(3, N), dtype=np.uint32)
    r = ntt.to_residues(np, x, tab)
    back = ntt.garner_to_u32(np, ntt.ntt_inv(np, ntt.ntt_fwd(np, r, tab), tab), tab)
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("N", [8, 32, 128])
def test_negacyclic_mul_numpy(N, rng):
    tab = modring.get_tables(N)
    a = rng.integers(0, 1 << 32, size=N, dtype=np.uint32)
    b = rng.integers(0, 1 << 8, size=N, dtype=np.uint32)  # one small operand
    got = ntt.negacyclic_mul_u32(np, a, b, tab)
    np.testing.assert_array_equal(got, naive_negacyclic_u32(a, b))


def test_negacyclic_monomial(rng):
    # multiplying by X^r must equal a rotation with sign wrap
    N = 64
    tab = modring.get_tables(N)
    a = rng.integers(0, 1 << 32, size=N, dtype=np.uint32)
    for r in (1, 5, N - 1):
        b = np.zeros(N, dtype=np.uint32)
        b[r] = 1
        got = ntt.negacyclic_mul_u32(np, a, b, tab)
        exp = np.empty(N, dtype=np.uint32)
        exp[r:] = a[: N - r]
        exp[:r] = (-a[N - r :].astype(np.int64) % (1 << 32)).astype(np.uint32)
        np.testing.assert_array_equal(got, exp)


def test_jnp_matches_numpy(rng):
    import jax
    import jax.numpy as jnp

    N = 128
    tab = modring.get_tables(N)
    a = rng.integers(0, 1 << 32, size=(2, N), dtype=np.uint32)
    r_np = ntt.ntt_fwd(np, ntt.to_residues(np, a, tab), tab)

    @jax.jit
    def fwd(x):
        return ntt.ntt_fwd(jnp, ntt.to_residues(jnp, x, tab), tab)

    @jax.jit
    def inv(r):
        return ntt.garner_to_u32(jnp, ntt.ntt_inv(jnp, r, tab), tab)

    r_j = np.asarray(fwd(jnp.asarray(a)))
    np.testing.assert_array_equal(r_np, r_j)
    np.testing.assert_array_equal(np.asarray(inv(jnp.asarray(r_j))), a)
