"""MXU-friendly 4-step negacyclic NTT (N = 8 x 128 split).

The fused Pallas PBS kernel is bound by u32 multiplies on the VPU
(PERFORMANCE.md). This transform moves 7 of the 10 butterfly stages onto
the MXU:

    forward:  x [., 8(jA), 128(jB)]              (native sublane/lane tiling)
        1. residue + pre-twist psi^(128 jA)          (VPU, per-row constant)
        2. 3 radix-2 DIT stages over SUBLANES         (VPU rolls, cheap)
        3. twist TW[fA, jB] = psi^jB w^(jB freq(fA))  (VPU, Shoup)
        4. out = U @ W2_p, W2_p[jB, fB] = w^(8 jB fB) (MXU, int8-limb matmul)

No transposes anywhere: sublane contraction is explicit rolls, lane
contraction is a right-matmul; primes live in four separate arrays.

Output order: stored index (fA_s * 128 + fB) holds frequency
f = bitrev3(fA_s) + 8 fB of the evaluation set psi^(2f+1) — the same
evaluation set as fhe/ntt.py's bit-reversed transform, so converting
between domains (e.g. the bootstrap key) is a fixed permutation
(`perm_from_std`). Primes: the N<=1024 set (all < 2^16, balanced residues
fit two int8 limbs exactly).

This module holds the table builders and a numpy/jnp reference
implementation; ops/mxu_pbs.py is the fused kernel.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fhe.modring import primes_for, root_of_unity, shoup

N1, LOG_N1 = 8, 3  # sublane transform size


def _br(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


@functools.lru_cache(maxsize=None)
def mxu_tables(N: int):
    """All host-side tables for the forward/inverse MXU NTT at size N."""
    assert N % N1 == 0
    N2 = N // N1  # lane transform size (128 for N=1024)
    primes = primes_for(N)
    NP = len(primes)
    logN = N.bit_length() - 1

    t = {}
    t["N2"] = N2
    t["primes"] = primes
    # permutation: mxu stored index -> std bit-reversed index
    perm = np.zeros(N, dtype=np.int64)
    for fa_s in range(N1):
        fa = _br(fa_s, LOG_N1)
        for fb in range(N2):
            freq = fa + N1 * fb
            perm[fa_s * N2 + fb] = _br(freq, logN)
    t["perm_from_std"] = perm  # x_mxu = x_std[..., perm]

    pre = np.zeros((NP, N1), np.uint32)  # psi^(N2 jA)
    pre_sh = np.zeros_like(pre)
    # DIT stage twiddles over sublanes: stage s in {0,1,2}: m=2^s blocks,
    # t=N1/2^(s+1); butterfly twiddle for block i: w8br[m+i] where
    # w8br[j] = w8^(br3(j))... merged-psi is NOT used here (psi handled by
    # pre/TW); plain cyclic 8-point DFT: w8 = w^(N2), order 8.
    stage_tw = np.zeros((NP, LOG_N1, N1), np.uint32)  # per-row broadcast
    stage_tw_sh = np.zeros_like(stage_tw)
    tw = np.zeros((NP, N1, N2), np.uint32)  # TW[fA_s, jB]
    tw_sh = np.zeros_like(tw)
    # balanced 8-bit limb pairs, |limb| <= 128 (int16 storage: p = 2^16+1
    # in the N=2048 prime set balances to +-2^15, whose hi limb is exactly
    # 128 — representable in bf16, so MXU-exact, but not in int8)
    w2_limbs = np.zeros((NP, 2, N2, N2), np.int16)
    # inverse direction
    w2i_limbs = np.zeros((NP, 2, N2, N2), np.int16)
    twi = np.zeros((NP, N1, N2), np.uint32)
    twi_sh = np.zeros_like(twi)
    istage_tw = np.zeros((NP, LOG_N1, N1), np.uint32)
    istage_tw_sh = np.zeros_like(istage_tw)
    posti = np.zeros((NP, N1), np.uint32)  # psi^(-N2 jA) / N1scale
    posti_sh = np.zeros_like(posti)

    for pi, p in enumerate(primes):
        psi = root_of_unity(p, 2 * N)
        w = (psi * psi) % p  # order N
        w8 = pow(w, N2, p)  # order 8
        w8i = pow(w8, -1, p)
        psii = pow(psi, -1, p)
        wi = pow(w, -1, p)
        inv_n = pow(N, -1, p)

        for fa_s in range(N1):
            fa = _br(fa_s, LOG_N1)
            for jb in range(N2):
                v = (pow(psi, jb, p) * pow(w, (jb * fa) % N, p)) % p
                tw[pi, fa_s, jb] = v
                tw_sh[pi, fa_s, jb] = shoup(v, p)
                # fold the 8-point inverse scale (1/N1) in here
                v = (
                    pow(psii, jb, p)
                    * pow(wi, (jb * fa) % N, p)
                    * pow(N1, -1, p)
                ) % p
                twi[pi, fa_s, jb] = v
                twi_sh[pi, fa_s, jb] = shoup(v, p)

        def balanced_limbs(v):
            b = v if v <= p // 2 else v - p
            l0 = ((b + 128) & 255) - 128
            l1 = (b - l0) >> 8
            assert -128 <= l0 <= 128 and -128 <= l1 <= 128, (v, p)
            return l0, l1

        w2n = pow(w, N1, p)  # order N2
        w2ni = pow(w2n, -1, p)
        inv_n2 = pow(N2, -1, p)
        for jb in range(N2):
            for fb in range(N2):
                l0, l1 = balanced_limbs(pow(w2n, (jb * fb) % N2, p))
                w2_limbs[pi, 0, jb, fb] = l0
                w2_limbs[pi, 1, jb, fb] = l1
                # inverse includes the 1/N2 scale
                l0, l1 = balanced_limbs(
                    (pow(w2ni, (jb * fb) % N2, p) * inv_n2) % p
                )
                w2i_limbs[pi, 0, jb, fb] = l0
                w2i_limbs[pi, 1, jb, fb] = l1

    # Sublane stage twiddles: the 8-point stage (including the psi^(N2 jA)
    # fold) is exactly the standard merged-psi negacyclic transform at size
    # N1 with root psi8 = psi^N2 (psi8^2 = w^N2, psi8^N1 = -1): table
    # T8[j] = psi8^bitrev3(j), consumed per stage as T8[m + block].
    for pi, p in enumerate(primes):
        psi8 = pow(root_of_unity(p, 2 * N), N // N1, p)
        assert pow(psi8, N1, p) == p - 1
        psi8i = pow(psi8, -1, p)
        t8 = [pow(psi8, _br(j, LOG_N1), p) for j in range(N1)]
        t8i = [pow(psi8i, _br(j, LOG_N1), p) for j in range(N1)]
        for s in range(LOG_N1):
            m = 1 << s
            tstride = N1 >> (s + 1)
            for r in range(N1):
                blk = r // (2 * tstride)
                v = t8[m + blk]
                stage_tw[pi, s, r] = v
                stage_tw_sh[pi, s, r] = shoup(v, p)
        for s in range(LOG_N1):
            tstride = 1 << s
            h = N1 >> (s + 1)
            for r in range(N1):
                blk = r // (2 * tstride)
                v = t8i[h + blk]
                istage_tw[pi, s, r] = v
                istage_tw_sh[pi, s, r] = shoup(v, p)

    t.update(
        stage_tw=stage_tw, stage_tw_sh=stage_tw_sh,
        tw=tw, tw_sh=tw_sh, w2_limbs=w2_limbs, w2i_limbs=w2i_limbs,
        twi=twi, twi_sh=twi_sh, istage_tw=istage_tw, istage_tw_sh=istage_tw_sh,
    )
    return t


# ----------------------------------------------------------------------
# numpy reference (bit-exact model of the kernel pipeline)
# ----------------------------------------------------------------------


def fwd_ref(x_u32: np.ndarray, pi: int, N: int) -> np.ndarray:
    """Forward MXU-order NTT of residues [.., N] mod primes[pi] (numpy)."""
    t = mxu_tables(N)
    p = t["primes"][pi]
    N2 = t["N2"]
    lead = x_u32.shape[:-1]
    x = x_u32.astype(np.int64).reshape(lead + (N1, N2))
    # 3 negacyclic-8 (psi8-merged) stages over the jA axis
    for s in range(LOG_N1):
        tstride = N1 >> (s + 1)
        tw_row = t["stage_tw"][pi, s].astype(np.int64)  # [N1]
        v = np.roll(x, -tstride, axis=-2)
        t1 = (v * tw_row.reshape(N1, 1)) % p
        lower = (np.arange(N1) % (2 * tstride)) < tstride
        low = (x + t1) % p
        high = np.roll((x - t1) % p, tstride, axis=-2)
        x = np.where(lower.reshape(N1, 1), low, high)
    # twist
    x = (x * t["tw"][pi].astype(np.int64)) % p
    # lane matmul
    w2 = (
        t["w2_limbs"][pi, 0].astype(np.int64)
        + 256 * t["w2_limbs"][pi, 1].astype(np.int64)
    ) % p
    out = np.zeros_like(x)
    out = (x.astype(np.int64) @ w2) % p
    return out.astype(np.uint32).reshape(lead + (N,))


def inv_ref(x_u32: np.ndarray, pi: int, N: int) -> np.ndarray:
    """Inverse of fwd_ref (numpy)."""
    t = mxu_tables(N)
    p = t["primes"][pi]
    N2 = t["N2"]
    lead = x_u32.shape[:-1]
    x = x_u32.astype(np.int64).reshape(lead + (N1, N2))
    w2i = (
        t["w2i_limbs"][pi, 0].astype(np.int64)
        + 256 * t["w2i_limbs"][pi, 1].astype(np.int64)
    ) % p
    x = (x @ w2i) % p
    x = (x * t["twi"][pi].astype(np.int64)) % p
    # inverse (GS) stages over jA: br3 -> natural
    for s in range(LOG_N1):
        tstride = 1 << s
        tw_row = t["istage_tw"][pi, s].astype(np.int64)
        v = np.roll(x, -tstride, axis=-2)
        lower = (np.arange(N1) % (2 * tstride)) < tstride
        low = (x + v) % p
        high = np.roll(((x - v) % p) * tw_row.reshape(N1, 1) % p, tstride, axis=-2)
        x = np.where(lower.reshape(N1, 1), low, high)
    # scales: 1/N2 folded in w2i, 1/N1 folded in twi
    return x.astype(np.uint32).reshape(lead + (N,))
