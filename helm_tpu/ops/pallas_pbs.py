"""Fused Pallas blind-rotation kernel.

The jnp pipeline (fhe/pbs_jnp.py) is HBM-bound: every NTT stage of every
CMux iteration materializes [G, rows, NP, N] intermediates (~250 GB per
256-gate batch). This kernel keeps the accumulator and all temporaries in
VMEM for the whole n-iteration loop and streams only the bootstrap key from
HBM (double-buffered DMA), which is the memory-optimal schedule.

Design notes (see DESIGN.md §3 and the stage derivation below):
- batch layout [k+1, Gt, N]: per-gate rotation bits broadcast as [1, Gt, 1],
  polynomial ops vectorize over N=lanes with NO data-dependent gathers.
- NTT stages use a roll-based butterfly: for stride t,
    fwd:  t1 = w * roll(x, -t);  out = lower ? x+t1 : roll(x-t1, t)
    inv:  v = roll(x, -t); out = lower ? x+v : roll((x-v)*w, t)
  with per-stage twiddle-broadcast vectors precomputed host-side — every op
  is a static roll / elementwise u32 op, exactly what the VPU wants.
- all modular arithmetic is Shoup multiplication with prime/Garner constants
  baked into the kernel as literals (primes are compile-time fixed).

Bit-identical to the jnp path (tests/test_pallas.py runs interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fhe.modring import NttTables, get_tables, primes_for, shoup
from ..params import TfheParams

LOG2 = {1 << i: i for i in range(16)}


# ----------------------------------------------------------------------
# Host-side stage-twiddle tables
# ----------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def stage_twiddles(N: int):
    """Per-stage twiddle broadcast vectors [NP, L, N] (+ shoup) for the
    roll-based butterflies, both directions."""
    tab = get_tables(N)
    primes = primes_for(N)
    L = LOG2[N]
    NP = len(primes)
    fwd = np.zeros((NP, L, N), np.uint32)
    fwd_sh = np.zeros_like(fwd)
    inv = np.zeros((NP, L, N), np.uint32)
    inv_sh = np.zeros_like(fwd)
    for pi in range(NP):
        # forward: stage s has m = 2^s blocks of size 2t (t = N/2^(s+1))
        for s in range(L):
            m = 1 << s
            t = N >> (s + 1)
            for j in range(N):
                w = int(tab.psi_rev[pi, m + j // (2 * t)])
                fwd[pi, s, j] = w
                fwd_sh[pi, s, j] = shoup(w, primes[pi])
        # inverse: stage r has t = 2^r, h = N/(2t) blocks
        for r in range(L):
            t = 1 << r
            h = N >> (r + 1)
            for j in range(N):
                w = int(tab.psi_inv_rev[pi, h + j // (2 * t)])
                inv[pi, r, j] = w
                inv_sh[pi, r, j] = shoup(w, primes[pi])
    return fwd, fwd_sh, inv, inv_sh, tab


# ----------------------------------------------------------------------
# In-kernel math (operates on jnp values; primes are python literals)
# ----------------------------------------------------------------------


def _mul_shoup(a, w, w_sh, p: int):
    q = (a * w_sh) >> jnp.uint32(16)
    r = a * w - q * jnp.uint32(p)
    return jnp.where(r >= p, r - jnp.uint32(p), r)


def _add_mod(a, b, p: int):
    r = a + b
    return jnp.where(r >= p, r - jnp.uint32(p), r)


def _sub_mod(a, b, p: int):
    return jnp.where(a < b, a - b + jnp.uint32(p), a - b)


def _roll(x, shift: int):
    N = x.shape[-1]
    return pltpu.roll(x, shift % N, axis=x.ndim - 1)


def _lane_iota(shape, N):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


# A/B switch: reshape-based butterflies do half the modmuls of the
# roll-based form but rely on Mosaic handling [., m, 2, t] reshapes.
import os as _os

RESHAPE_NTT = _os.environ.get("HELM_TPU_RESHAPE_NTT", "0") == "1"


def _ntt_fwd_reshape(x, psi, psi_sh, pi: int, p: int, N: int):
    lead = x.shape[:-1]
    m, t = 1, N
    while m < N:
        t //= 2
        v = x.reshape(lead + (m, 2, t))
        sl = psi[pi, m : 2 * m].reshape(m, 1)
        sl_sh = psi_sh[pi, m : 2 * m].reshape(m, 1)
        u = v[..., 0, :]
        w = _mul_shoup(v[..., 1, :], sl, sl_sh, p)
        x = jnp.stack([_add_mod(u, w, p), _sub_mod(u, w, p)], axis=-2).reshape(
            lead + (N,)
        )
        m *= 2
    return x


def _ntt_inv_reshape(x, psi_i, psi_i_sh, pi: int, p: int, N: int, n_inv: int, n_inv_sh: int):
    lead = x.shape[:-1]
    t, m = 1, N
    while m > 1:
        h = m // 2
        v = x.reshape(lead + (h, 2, t))
        sl = psi_i[pi, h : 2 * h].reshape(h, 1)
        sl_sh = psi_i_sh[pi, h : 2 * h].reshape(h, 1)
        u = v[..., 0, :]
        w = v[..., 1, :]
        x = jnp.stack(
            [_add_mod(u, w, p), _mul_shoup(_sub_mod(u, w, p), sl, sl_sh, p)],
            axis=-2,
        ).reshape(lead + (N,))
        t *= 2
        m = h
    return _mul_shoup(x, jnp.uint32(n_inv), jnp.uint32(n_inv_sh), p)


def _ntt_fwd(x, ftw, ftw_sh, pi: int, p: int, N: int):
    """x: u32 [..., N] residues -> bit-reversed NTT, roll-based stages."""
    L = LOG2[N]
    lanes = _lane_iota(x.shape, N)
    for s in range(L):
        t = N >> (s + 1)
        w = ftw[pi, s]
        w_sh = ftw_sh[pi, s]
        t1 = _mul_shoup(_roll(x, -t), w, w_sh, p)
        low = _add_mod(x, t1, p)
        high = _roll(_sub_mod(x, t1, p), t)
        # (lanes % 2t) < t is a compile-time constant mask — keep it that way
        x = jnp.where((lanes % (2 * t)) < t, low, high)
    return x


def _ntt_inv(x, itw, itw_sh, pi: int, p: int, N: int, n_inv: int, n_inv_sh: int):
    L = LOG2[N]
    lanes = _lane_iota(x.shape, N)
    for r in range(L):
        t = 1 << r
        w = itw[pi, r]
        w_sh = itw_sh[pi, r]
        v = _roll(x, -t)
        low = _add_mod(x, v, p)
        high = _roll(_mul_shoup(_sub_mod(x, v, p), w, w_sh, p), t)
        x = jnp.where((lanes % (2 * t)) < t, low, high)
    return _mul_shoup(x, jnp.uint32(n_inv), jnp.uint32(n_inv_sh), p)


def _garner(res, g, primes):
    """4 residue arrays -> signed value mod 2^32 (u32), literal constants."""
    p0, p1, p2, p3 = primes
    r0, r1, r2, r3 = res
    v0 = r0
    t1 = _sub_mod(r1, v0, p1)
    v1 = _mul_shoup(t1, jnp.uint32(g.inv_p0_mod_p1), jnp.uint32(g.inv_p0_mod_p1_sh), p1)
    m2 = _add_mod(v0, _mul_shoup(v1, jnp.uint32(g.p0_mod_p2), jnp.uint32(g.p0_mod_p2_sh), p2), p2)
    t2 = _sub_mod(r2, m2, p2)
    v2 = _mul_shoup(t2, jnp.uint32(g.inv_p01_mod_p2), jnp.uint32(g.inv_p01_mod_p2_sh), p2)
    m3 = _add_mod(v0, _mul_shoup(v1, jnp.uint32(g.p0_mod_p3), jnp.uint32(g.p0_mod_p3_sh), p3), p3)
    m3 = _add_mod(m3, _mul_shoup(v2, jnp.uint32(g.p01_mod_p3), jnp.uint32(g.p01_mod_p3_sh), p3), p3)
    t3 = _sub_mod(r3, m3, p3)
    v3 = _mul_shoup(t3, jnp.uint32(g.inv_p012_mod_p3), jnp.uint32(g.inv_p012_mod_p3_sh), p3)
    x = v0 + jnp.uint32(p0) * (v1 + jnp.uint32(p1) * (v2 + jnp.uint32(p2) * v3))
    return jnp.where(v3 > jnp.uint32(g.half_p3), x - jnp.uint32(g.prod_mod_q), x)



def _digit_residues(d, bl: int, p: int):
    """Signed gadget digit (int32, |d| <= 2^(bl-1)) -> residue in [0, p).

    The approximate-gadget mask base can reach 2^16 (digits +-2^15),
    exceeding the smallest NTT prime (12289): reduce by conditional
    subtraction (u < 8p for every prime) then shift off the +2^15 bias."""
    if (1 << (bl - 1)) < p:
        return jnp.where(d < 0, d + p, d).astype(jnp.uint32)
    u = (d + jnp.int32(1 << 15)).astype(jnp.uint32)  # [0, 2^16] < 8p
    for m in (4, 2, 1):
        u = jnp.where(u >= m * p, u - jnp.uint32(m * p), u)
    return _sub_mod(u, jnp.uint32((1 << 15) % p), p)


def _negacyclic_rotate(x, amt, N: int):
    """x: [P, Gt, N]; amt: int32 [Gt] in [0, 2N) — barrel rotator."""
    lanes = _lane_iota(x.shape, N)
    for s_log in range(LOG2[N]):
        s = 1 << s_log
        bit = ((amt >> s_log) & 1)[None, :, None]
        rolled = _roll(x, s)
        rotated = jnp.where(lanes < s, jnp.uint32(0) - rolled, rolled)
        x = jnp.where(bit == 1, rotated, x)
    bit = ((amt >> LOG2[N]) & 1)[None, :, None]
    return jnp.where(bit == 1, jnp.uint32(0) - x, x)


def _decompose(v, base_log: int, levels: int):
    """u32 [...] -> list of int32 digit arrays, level 0 = weight q/B."""
    total = base_log * levels
    b = 1 << base_log
    r = ((v >> jnp.uint32(32 - total - 1)) + jnp.uint32(1)) >> 1
    r = r & jnp.uint32((1 << total) - 1)
    digits = []
    for _ in range(levels):
        d = (r & jnp.uint32(b - 1)).astype(jnp.int32)
        carry = d >= (b // 2)
        d = jnp.where(carry, d - b, d)
        r = (r >> jnp.uint32(base_log)) + carry.astype(jnp.uint32)
        digits.append(d)
    digits.reverse()
    return digits


# ----------------------------------------------------------------------
# The fused kernel
# ----------------------------------------------------------------------


def _make_kernel(params: TfheParams, tab: NttTables, n_inv, n_inv_sh, g_tile: int):
    N, k, n = params.N, params.k, params.n
    kp1 = k + 1
    gadgets = params.component_gadgets  # per-component (base_log, levels)
    rows = params.gadget_rows
    PRIMES = tuple(int(p) for p in tab.primes)
    garner_c = tab.garner

    def kernel(
        acc0_ref,  # [kp1, Gt, N] u32 (init accumulator; read at j==0)
        abar_ref,  # [1, n, 128] int32 (tile's rotation amounts, lane-padded)
        ftw_ref,
        ftw_sh_ref,
        itw_ref,
        itw_sh_ref,
        bsk_ref,  # [1, rows, kp1, NP, N] — iteration j's GGSW (auto-pipelined)
        bsk_sh_ref,
        out_ref,  # [kp1, Gt, N]
        acc_scr,  # VMEM [kp1, Gt, N] persistent across the n grid steps
    ):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_scr[...] = acc0_ref[...]

        acc = acc_scr[...]
        ftw = ftw_ref[...]
        ftw_sh = ftw_sh_ref[...]
        itw = itw_ref[...]
        itw_sh = itw_sh_ref[...]
        a_i = abar_ref[0, j, :g_tile]  # [Gt]
        rot = _negacyclic_rotate(acc, a_i, N)
        diff = rot - acc  # u32 wrap
        # decompose each poly -> rows in order c*levels + lvl
        row_res = []  # per row: per prime residue arrays [Gt, N]
        for c in range(kp1):
            bl_c, lv_c = gadgets[c]
            digs = _decompose(diff[c], bl_c, lv_c)
            for d in digs:
                row_res.append(
                    [_digit_residues(d, bl_c, p) for p in PRIMES]
                )
        # forward NTTs once per (row, prime)
        for r_i in range(rows):
            for pi, p in enumerate(PRIMES):
                if RESHAPE_NTT:
                    row_res[r_i][pi] = _ntt_fwd_reshape(
                        row_res[r_i][pi], ftw, ftw_sh, pi, p, N
                    )
                else:
                    row_res[r_i][pi] = _ntt_fwd(
                        row_res[r_i][pi], ftw, ftw_sh, pi, p, N
                    )
        conv = []
        for c2 in range(kp1):
            res_primes = []
            for pi, p in enumerate(PRIMES):
                s = None
                for r_i in range(rows):
                    f = row_res[r_i][pi]
                    w = bsk_ref[0, r_i, c2, pi]
                    w_sh = bsk_sh_ref[0, r_i, c2, pi]
                    t = _mul_shoup(f, w, w_sh, p)
                    s = t if s is None else s + t
                # lazy sum < rows * p: reduce stepwise
                m = 4
                while m >= 1:
                    s = jnp.where(s >= m * p, s - jnp.uint32(m * p), s)
                    m //= 2
                if RESHAPE_NTT:
                    y = _ntt_inv_reshape(
                        s, itw, itw_sh, pi, p, N,
                        int(n_inv[pi]), int(n_inv_sh[pi]),
                    )
                else:
                    y = _ntt_inv(
                        s, itw, itw_sh, pi, p, N,
                        int(n_inv[pi]), int(n_inv_sh[pi]),
                    )
                res_primes.append(y)
            conv.append(_garner(res_primes, garner_c, PRIMES))
        acc = acc + jnp.stack(conv, axis=0)  # [kp1, Gt, N]
        acc_scr[...] = acc

        @pl.when(j == n - 1)
        def _():
            out_ref[...] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("params", "g_tile", "interpret"))
def blind_rotate_pallas(
    params: TfheParams,
    bsk_ntt,
    bsk_ntt_sh,
    lwe_in,
    testv,
    g_tile: int = 16,
    interpret: bool = False,
):
    """Pallas counterpart of fhe.pbs_jnp.blind_rotate. Returns [G, k+1, N]."""
    from ..fhe import ops as fops

    N, k, n = params.N, params.k, params.n
    kp1 = k + 1
    rows = params.gadget_rows
    NP = len(primes_for(N))
    G = lwe_in.shape[0]
    if testv.ndim == 1:
        testv = testv[None, :]
    if G % g_tile:
        pad = g_tile - G % g_tile
        lwe_in = jnp.concatenate(
            [lwe_in, jnp.zeros((pad, n + 1), jnp.uint32)], axis=0
        )
        if testv.shape[0] != 1:
            testv = jnp.concatenate(
                [testv, jnp.zeros((pad, N), jnp.uint32)], axis=0
            )
    Gp = lwe_in.shape[0]

    ftw, ftw_sh, itw, itw_sh, tab = stage_twiddles(N)
    if RESHAPE_NTT:
        ftw, ftw_sh = tab.psi_rev, tab.psi_rev_sh
        itw, itw_sh = tab.psi_inv_rev, tab.psi_inv_rev_sh
    abar = fops.mod_switch(jnp, lwe_in[:, :n], N).astype(jnp.int32)  # [Gp, n]
    bbar = fops.mod_switch(jnp, lwe_in[:, n], N)
    neg_b = (jnp.uint32(2 * N) - bbar) & jnp.uint32(2 * N - 1)
    body = fops.negacyclic_rotate(
        jnp, jnp.broadcast_to(testv, (Gp, N)), neg_b, N
    )
    acc0 = jnp.concatenate(
        [jnp.zeros((k, Gp, N), jnp.uint32), body[None]], axis=0
    )  # [kp1, Gp, N]

    kernel = _make_kernel(params, tab, tab.n_inv, tab.n_inv_sh, g_tile)
    L = LOG2[N]
    tiles = Gp // g_tile
    # abar per tile, lane-padded to 128: [tiles, n, 128]
    abar_t = (
        jnp.transpose(abar.reshape(tiles, g_tile, n), (0, 2, 1))
        if g_tile == 128
        else jnp.pad(
            jnp.transpose(abar.reshape(tiles, g_tile, n), (0, 2, 1)),
            ((0, 0), (0, 0), (0, 128 - g_tile)),
        )
    )
    grid = (tiles, n)
    tw_shape = (NP, N) if RESHAPE_NTT else (NP, L, N)
    tw_map = (lambda i, j: (0, 0)) if RESHAPE_NTT else (lambda i, j: (0, 0, 0))
    in_specs_tw = [
        pl.BlockSpec(tw_shape, tw_map, memory_space=pltpu.VMEM) for _ in range(4)
    ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kp1, g_tile, N), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            *in_specs_tw,
            pl.BlockSpec(
                (1, rows, kp1, NP, N), lambda i, j: (j, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows, kp1, NP, N), lambda i, j: (j, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (kp1, g_tile, N), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((kp1, Gp, N), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((kp1, g_tile, N), jnp.uint32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        acc0,
        abar_t,
        jnp.asarray(ftw),
        jnp.asarray(ftw_sh),
        jnp.asarray(itw),
        jnp.asarray(itw_sh),
        bsk_ntt,
        bsk_ntt_sh,
    )
    acc = jnp.transpose(out, (1, 0, 2))  # [Gp, kp1, N]
    return acc[:G]


def bootstrap_pallas(dsk, lwe_in, testv, g_tile: int = 16, interpret: bool = False):
    """Full PBS with the Pallas blind rotation (extract+KS stay in XLA)."""
    from ..fhe import ops as fops
    from ..fhe.pbs_jnp import keyswitch

    acc = blind_rotate_pallas(
        dsk.params,
        dsk.bsk_ntt,
        dsk.bsk_ntt_sh,
        lwe_in,
        testv,
        g_tile=g_tile,
        interpret=interpret,
    )
    big = fops.sample_extract(jnp, acc, dsk.params.k, dsk.params.N)
    return keyswitch(dsk, big)
