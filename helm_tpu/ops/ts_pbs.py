"""Multi-bit MXU blind rotation, TRANSPOSED layout (gates in sublanes).

Motivation (measured, tools/ptw_probe.py on-chip 2026-08-19): in the
frequency-in-sublanes (fs) kernel the pointwise stage's BSK operands are
[N2, 1] columns lane-splat to [N2, G] — 53% of kernel time at
GATES_128_K3, and the splats are also what makes Mosaic compiles slow.
With gates in SUBLANES and frequencies in LANES the same operand is a
[1, L] row broadcast across sublanes, which the VPU does natively:
the probe's transposed pattern (two fA tiles packed per 128-lane array)
ran 20.4 us/unit vs 32.5 us/unit for the fs pattern with its BSK loads
REMOVED entirely (A pattern did not finish compiling in 580 s).

Layout: every polynomial is TP = N1/2 arrays of [S (gates/rows,
sublanes), L = 2*N2 (frequencies, lanes)]; array tp packs fA tiles
(tp, tp+4) in its lane halves, chosen so only the FIRST forward 8-point
stage (t = 4 butterflies) needs an in-array lane-half swap — the other
stages are elementwise across arrays with per-half scalar twiddles.
The 128-point NTT matmul becomes x [S, L] @ W [L, L] with W the
block-diagonal of the two packed tiles' (twist-folded) matrices; the
monomial one-hot selection transposes to oh [G, LOW] @ table [LOW,
N1*N2]; everything else (decomposition, residues, Barrett chains,
subset combination, CRT) is elementwise and shared with ops/mxu_pbs.

Bit-identical to pbs_jnp.bootstrap / the fs kernel (same accumulation
orders and reduction points). Reference semantics: one programmable
bootstrap per gate/LUT, multi-bit grouping per tfhe-rs's multi-bit PBS
(reference src/bin/helm.rs:81-88 uses group-3 multibit parameters).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fhe.modring import primes_for
from ..params import TfheParams
from . import mxu_ntt
from .mxu_pbs import (
    LOG2,
    LOG_N1,
    N1,
    _crt_fast,
    _decompose,
    _digit_residues,
    _fgmul,
    _fs_tables,
    _iotaL,
    _madd,
    _mshoup,
    _msub,
    _redfb,
    _redfbt,
    _rollL,
    _split256,
    _to_bal_f32,
)

TP = N1 // 2  # lane-packed tile pairs (tp, tp+4)


#: default multi-bit kernel: "fs" | "ts" | "hb" | "hb2".
#: hb  = hybrid: fs transforms + ts-oriented pointwise
#:       (blind_rotate_fs_mb(tsptw=True), BSK = mxu_server_key_ts)
#: hb2 = hb with host-precomputed BSK limb-pair rows (blimb,
#:       BSK = mxu_server_key_hb2)
#: Flip after an on-chip A/B, never on a projection.
DEFAULT_MB_KERNEL = "fs"


def mb_kernel() -> str:
    """Multi-bit kernel choice: HELM_TPU_MB_KERNEL env beats the default.

    History (all on-chip at GATES_128_K3, gt=512, blind-rotation rot/s;
    PERFORMANCE.md round 3 has the full stage map):
      fs 3068.0 — production default.
      ts 2845.6 — block-diagonal [L, L] transform matmuls do 2x the
        MACs of fs's dense [N2, N2] ones (fwd matmul alone 68.7 ms per
        1024 vs fs's whole 59 ms transform complement).
      hb 2640.1 (implrow 2748.6) — fs transforms + ts pointwise via
        in-kernel transposes; Mosaic's f32 [128, 4096] transposes run
        ~64 GB/s effective, costing more (~110 ms) than the splat
        savings (~65 ms); ceiling with FREE loads measured 3350.
      hb2 2680.9 (implrow 2819.6) — hb + host-precomputed BSK limb-pair
        rows (no runtime _split256 in pointwise): +1.5..2.6% over hb,
        still under fs.
      fs16 — fs with the BSK slab in balanced int16 (round-4 splat-
        traffic A/B: half the splat bytes, +1 convert per term); see
        PERFORMANCE.md round 4 for the measurement.
    All variants are bit-identical (tests/test_pallas.py) and kept as
    tested alternates / recorded negative results."""
    env = os.environ.get("HELM_TPU_MB_KERNEL")
    if env in ("fs", "fs16", "ts", "hb", "hb2", "ps"):
        return env
    if os.environ.get("HELM_TPU_TS_KERNEL", "0") == "1":  # legacy knob
        return "ts"
    return DEFAULT_MB_KERNEL


def use_ts_kernel() -> bool:
    return mb_kernel() == "ts"


def _ts_fwd8(xs, stw, pi: int, p: int):
    """Forward negacyclic-8 CT stages in packed-transposed layout.

    xs: TP arrays [S, L]; array tp holds fA tiles (tp, tp+4) in lane
    halves. Mirrors mxu_pbs._fs_fwd8's butterfly order exactly:
    stage t=4 pairs (i, i+4) are the two lane halves of array i;
    stage t=2 pairs (0,2),(1,3) [half 0] and (4,6),(5,7) [half 1];
    stage t=1 pairs (0,1),(2,3) [half 0] and (4,5),(6,7) [half 1]."""
    L = xs[0].shape[-1]
    h = L // 2
    lane = _iotaL(xs[0].shape)

    def wv(s, a):  # [1-broadcast] twiddle: half 0 = tile a, half 1 = a+4
        lo = jnp.uint32(int(stw[0][pi, s, a]))
        hi = jnp.uint32(int(stw[0][pi, s, a + 4]))
        lo_sh = jnp.uint32(int(stw[1][pi, s, a]))
        hi_sh = jnp.uint32(int(stw[1][pi, s, a + 4]))
        return (
            jnp.where(lane < h, lo, hi),
            jnp.where(lane < h, lo_sh, hi_sh),
        )

    # s=0, t=4: in-array half butterfly, twiddle stw[pi, 0, a] per array
    ys = []
    for a in range(TP):
        x = xs[a]
        sw = _rollL(x, h)
        xlo = jnp.where(lane < h, x, sw)
        xhi = jnp.where(lane < h, sw, x)
        t1 = _mshoup(
            xhi,
            jnp.uint32(int(stw[0][pi, 0, a])),
            jnp.uint32(int(stw[1][pi, 0, a])),
            p,
        )
        ys.append(
            jnp.where(lane < h, _madd(xlo, t1, p), _msub(xlo, t1, p))
        )
    xs = ys
    # s=1, t=2: array pairs (0,2),(1,3); twiddles (a, a+4) per half
    ys = [None] * TP
    for a in (0, 1):
        w, w_sh = wv(1, a)
        t1 = _mshoup(xs[a + 2], w, w_sh, p)
        ys[a] = _madd(xs[a], t1, p)
        ys[a + 2] = _msub(xs[a], t1, p)
    xs = ys
    # s=2, t=1: array pairs (0,1),(2,3); twiddles (a, a+4) per half
    ys = [None] * TP
    for a in (0, 2):
        w, w_sh = wv(2, a)
        t1 = _mshoup(xs[a + 1], w, w_sh, p)
        ys[a] = _madd(xs[a], t1, p)
        ys[a + 1] = _msub(xs[a], t1, p)
    return ys


def _ts_inv8(xs, istw, pi: int, p: int):
    """Inverse GS stages, mirror of mxu_pbs._fs_inv8 in packed layout."""
    L = xs[0].shape[-1]
    h = L // 2
    lane = _iotaL(xs[0].shape)

    def wv(s, a):
        lo = jnp.uint32(int(istw[0][pi, s, a]))
        hi = jnp.uint32(int(istw[0][pi, s, a + 4]))
        lo_sh = jnp.uint32(int(istw[1][pi, s, a]))
        hi_sh = jnp.uint32(int(istw[1][pi, s, a + 4]))
        return (
            jnp.where(lane < h, lo, hi),
            jnp.where(lane < h, lo_sh, hi_sh),
        )

    # s=0, t=1: array pairs (0,1),(2,3); twiddles istw[pi, 0, {a, a+4}]
    ys = [None] * TP
    for a in (0, 2):
        w, w_sh = wv(0, a)
        ys[a] = _madd(xs[a], xs[a + 1], p)
        ys[a + 1] = _mshoup(_msub(xs[a], xs[a + 1], p), w, w_sh, p)
    xs = ys
    # s=1, t=2: array pairs (0,2),(1,3)
    ys = [None] * TP
    for a in (0, 1):
        w, w_sh = wv(1, a)
        ys[a] = _madd(xs[a], xs[a + 2], p)
        ys[a + 2] = _mshoup(_msub(xs[a], xs[a + 2], p), w, w_sh, p)
    xs = ys
    # s=2, t=4: in-array half butterfly, twiddle istw[pi, 2, a]
    ys = []
    for a in range(TP):
        x = xs[a]
        sw = _rollL(x, h)
        xlo = jnp.where(lane < h, x, sw)
        xhi = jnp.where(lane < h, sw, x)
        low = _madd(xlo, xhi, p)
        hi_v = _mshoup(
            _msub(xlo, xhi, p),
            jnp.uint32(int(istw[0][pi, 2, a])),
            jnp.uint32(int(istw[1][pi, 2, a])),
            p,
        )
        ys.append(jnp.where(lane < h, low, hi_v))
    return ys


def _mmL_bal(bal, w0, w1, p: int, inv_p: float):
    """(bal @ W) mod p in the transposed layout, balanced f32 in/out.

    bal: [S, L] with |.| <= p//2; w0/w1: [L, L] bf16 8-bit limb matrices
    (block-diagonal per packed tile pair). Same limb/epilogue structure
    as mxu_pbs._mm128_bal (bit-identical reduction points)."""
    a0, a1 = _split256(bal)
    a0 = a0.astype(jnp.bfloat16)
    a1 = a1.astype(jnp.bfloat16)

    def mm(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    m00 = mm(a0, w0)
    mid = mm(a0, w1) + mm(a1, w0)
    m11 = mm(a1, w1)
    hi = _redfbt(m11, p, inv_p)
    u = _redfb(mid, p, inv_p)
    s1 = _redfbt(u + 256.0 * hi, p, inv_p)
    return _redfbt(m00 + 256.0 * s1, p, inv_p)


def _lane_cols_ts(N: int) -> np.ndarray:
    """Column order of the packed-transposed lane axis: flat column
    c = tp*L + half*N2 + jb maps to fs row fa*N2 + jb with fa = half*4+tp."""
    N2 = N // N1
    cols = np.zeros(N, np.int64)
    for tp in range(TP):
        for half in range(2):
            fa = half * TP + tp
            for jb in range(N2):
                cols[tp * 2 * N2 + half * N2 + jb] = fa * N2 + jb
    return cols


@functools.lru_cache(maxsize=None)
def _ts_tables(N: int):
    """Transposed variants of mxu_pbs._fs_tables (host-side, cached).

    tloT/thiT: [NP, 2, LOW|HB, N1*N2] — one-hot tables transposed with
    lane columns in packed order (slice tp*L:(tp+1)*L = tile pair tp).
    w2fT/w2fiT: [NP, TP, 2, L, L] — per tile pair, the block-diagonal of
    the two packed tiles' twist-folded 128-point matrices, transposed
    for right-multiplication (x @ W)."""
    fst = _fs_tables(N)
    N2 = N // N1
    L = 2 * N2
    NP = len(primes_for(N))
    cols = _lane_cols_ts(N)

    tloT = np.ascontiguousarray(
        np.transpose(fst["tlo"], (0, 1, 3, 2))[:, :, :, cols]
    )
    thiT = np.ascontiguousarray(
        np.transpose(fst["thi"], (0, 1, 3, 2))[:, :, :, cols]
    )
    w2fT = np.zeros((NP, TP, 2, L, L), np.float32)
    w2fiT = np.zeros((NP, TP, 2, L, L), np.float32)
    for pi in range(NP):
        for tp in range(TP):
            for limb in range(2):
                # fwd fs: out[fb, l] = sum_jb W[fb, jb] x[jb, l]
                # ts:  out[l', fb] = sum_jb x[l', jb] W[fb, jb] -> WT[jb, fb]
                w2fT[pi, tp, limb, :N2, :N2] = fst["w2f"][pi, tp, limb].T
                w2fT[pi, tp, limb, N2:, N2:] = fst["w2f"][
                    pi, tp + TP, limb
                ].T
                w2fiT[pi, tp, limb, :N2, :N2] = fst["w2fi"][pi, tp, limb].T
                w2fiT[pi, tp, limb, N2:, N2:] = fst["w2fi"][
                    pi, tp + TP, limb
                ].T
    t_host = mxu_ntt.mxu_tables(N)
    return {
        "tloT": tloT,
        "thiT": thiT,
        "w2fT": w2fT,
        "w2fiT": w2fiT,
        "stw": (t_host["stage_tw"], t_host["stage_tw_sh"]),
        "istw": (t_host["istage_tw"], t_host["istage_tw_sh"]),
    }


def mxu_server_key_ts(dsk):
    """Grouped BSK as balanced f32 rows in transposed-packed layout:
    [groups, RS, L] with row = ((((v-1)*kp1 + c2)*NP + pi)*TP + tp)*rows
    + r and lane = half*N2 + jb for fA tile = half*4 + tp. Each pointwise
    term costs ONE [1, L] row broadcast across gate sublanes."""
    from .mxu_pbs import _layout_cache

    def build():
        N = dsk.bsk_ntt.shape[-1]
        N2 = N // N1
        t = mxu_ntt.mxu_tables(N)
        perm = jnp.asarray(t["perm_from_std"])
        groups, nv3, rows, kp1, NP, _ = dsk.bsk_ntt.shape
        pr = jnp.asarray(
            np.array(primes_for(dsk.params.N), np.int32)
        ).reshape(1, 1, 1, 1, NP, 1)

        @jax.jit
        def make(b_u32):
            b = b_u32.astype(jnp.int32)
            bal = jnp.where(b > pr // 2, b - pr, b).astype(jnp.float32)
            x = bal[..., perm].reshape(
                groups, nv3, rows, kp1, NP, 2, TP, N2
            )
            # [g, v, r, c2, pi, half, tp, jb] -> [g, v, c2, pi, tp, r, half, jb]
            x = jnp.transpose(x, (0, 1, 3, 4, 6, 2, 5, 7))
            return x.reshape(groups, nv3 * kp1 * NP * TP * rows, 2 * N2)

        return make(dsk.bsk_ntt)

    return _layout_cache("ts", dsk.bsk_ntt, build)


def mxu_server_key_hb2(dsk):
    """TS-layout BSK as host-precomputed 8-bit limb row PAIRS.

    [groups, 2*RS, L]: rows [0, RS) are the low limbs, rows [RS, 2*RS)
    the high limbs of the balanced f32 entries (b = lo + 256*hi,
    |lo|,|hi| <= 128). The hybrid kernel's `blimb` path multiplies the
    UNSPLIT forward rows by these limb rows directly, removing every
    runtime _split256 in the pointwise stage; |fwd * limb| <= (p/2)*128
    keeps the same chunked-f32 exactness bound as the fwd-split form, so
    the final outputs are bit-identical."""
    from .mxu_pbs import _layout_cache

    def build():
        full = mxu_server_key_ts(dsk)  # [groups, RS, L] balanced f32
        hi = jnp.floor(full * (1.0 / 256.0) + 0.5)
        lo = full - 256.0 * hi
        return jnp.concatenate([lo, hi], axis=1)

    return _layout_cache("hb2", dsk.bsk_ntt, build)


def _make_kernel_ts_mb(
    params: TfheParams, g_tile: int, ablate: frozenset = frozenset()
):
    N, k, n = params.N, params.k, params.n
    g = params.grouping
    nv = 1 << g
    N2 = N // N1
    L = 2 * N2
    kp1 = k + 1
    gadgets = params.component_gadgets
    rows_tot = params.gadget_rows
    PRIMES = tuple(int(p) for p in primes_for(N))
    NP = len(PRIMES)
    INV_P = tuple(1.0 / p for p in PRIMES)
    PROD = 1
    for _p in PRIMES:
        PROD *= _p
    CRT_W_MOD = []
    CRT_FRAC = []
    for _p in PRIMES:
        m = PROD // _p
        w = m * pow(m, -1, _p)
        CRT_W_MOD.append(w % (1 << 32))
        CRT_FRAC.append(float(w / PROD))
    PROD_MOD = PROD % (1 << 32)
    G = g_tile
    ts = _ts_tables(N)
    STW, ISTW = ts["stw"], ts["istw"]
    LOW = min(64, 2 * N)
    HBW = max(1, (2 * N) // LOW)

    def kernel(
        acc0_ref,  # [1, kp1, TP, G, L]
        abar_ref,  # [1, n, G] int32
        w2f_ref,  # [NP, TP, 2, L, L] bf16
        w2fi_ref,  # [NP, TP, 2, L, L] bf16
        tlo_ref,  # [NP, 2, LOW, N1*N2] bf16
        thi_ref,  # [NP, 2, HBW, N1*N2] bf16
        bsk_ref,  # f32 [1, RS, L]
        out_ref,  # [kp1, TP, G, L]
        acc_scr,  # [kp1, TP, G, L]
    ):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_scr[...] = acc0_ref[0]

        def ohmm(ohT, tref):
            # one-hots are built TRANSPOSED ([K, G]: per-gate exponent in
            # lanes — a dynamic LANE slice of abar would need provable
            # 128-alignment in Mosaic, a dynamic sublane index is free);
            # contract dim 0 of both operands -> [G, M]
            return jax.lax.dot_general(
                ohT, tref, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        ohs = []
        for i in range(g if "noladder" not in ablate else 0):
            a_row = abar_ref[0, g * j + i, :][None, :]  # [1, G] int32
            alo = a_row & (LOW - 1)
            ahi = a_row >> LOG2[LOW]
            ohs.append((
                (
                    jax.lax.broadcasted_iota(jnp.int32, (LOW, G), 0) == alo
                ).astype(jnp.bfloat16),
                (
                    jax.lax.broadcasted_iota(jnp.int32, (HBW, G), 0) == ahi
                ).astype(jnp.bfloat16),
            ))

        digs = [[] for _ in range(TP)]
        for c in range(kp1):
            bl_c, lv_c = gadgets[c]
            for tp in range(TP):
                if "nodec" in ablate:  # probe: decomposition cost
                    d = (acc_scr[c, tp] >> jnp.uint32(24)).astype(jnp.int32)
                    digs[tp].extend([d] * lv_c)
                else:
                    digs[tp].extend(_decompose(acc_scr[c, tp], bl_c, lv_c))

        inv_res = []
        for pi, p in enumerate(PRIMES):
            ip = INV_P[pi]
            hp = p // 2
            chunk = (1 << 24) // ((hp + 1) * 128)
            dchunk = ((1 << 24) - hp - 2 * p) // ((hp + 1) * 128)

            row_bl = [bl for bl, lv in gadgets for _ in range(lv)]
            xs = []
            for tp in range(TP):
                stacked = jnp.concatenate(
                    [
                        _digit_residues(d, bl, p, ip)
                        for d, bl in zip(digs[tp], row_bl)
                    ],
                    axis=0,
                )  # [rows*G, L]
                xs.append(stacked)
            if "nofwd8" not in ablate:
                xs = _ts_fwd8(xs, STW, pi, p)
            fwd_pi = [[None] * TP for _ in range(rows_tot)]
            for tp in range(TP):
                if "nofmm" in ablate:  # probe: fwd matmul cost
                    f = _to_bal_f32(xs[tp], p)
                else:
                    f = _mmL_bal(
                        _to_bal_f32(xs[tp], p),
                        w2f_ref[pi, tp, 0],
                        w2f_ref[pi, tp, 1],
                        p,
                        ip,
                    )
                for r in range(rows_tot):
                    fwd_pi[r][tp] = f[r * G : (r + 1) * G, :]

            # monomial NTTs for ALL tiles at once: [G, N1*N2]
            Mall = []
            for i in range(g if "noladder" not in ablate else 0):
                oh_lo, oh_hi = ohs[i]
                l0 = ohmm(oh_lo, tlo_ref[pi, 0])
                l1 = ohmm(oh_lo, tlo_ref[pi, 1])
                hv = ohmm(oh_hi, thi_ref[pi, 0]) + 256.0 * ohmm(
                    oh_hi, thi_ref[pi, 1]
                )
                Mall.append(
                    _redfbt(
                        l0 * hv + 256.0 * _redfbt(l1 * hv, p, ip), p, ip
                    )
                )
            pva = {}
            if "noladder" in ablate:  # runtime scalar: no const-folding
                one = jnp.broadcast_to(
                    bsk_ref[0][0:1, 0:1], (G, N1 * N2)
                ).astype(jnp.float32)
                Mall = [one for _ in range(g)]
            for v in range(1, nv):
                idxs = [i for i in range(g) if (v >> i) & 1]
                cur = Mall[idxs[0]] - 1.0
                for i in idxs[1:]:
                    cur = _fgmul(cur, Mall[i] - 1.0, p, ip)
                pva[v] = _split256(cur)

            conv_pi = [[None] * TP for _ in range(kp1)]
            for tp in range(TP if "noptw" not in ablate else 0):
                sl = slice(tp * L, (tp + 1) * L)
                pvt = {
                    v: (pva[v][0][:, sl], pva[v][1][:, sl])
                    for v in range(1, nv)
                }
                D = [[None, None, None] for _ in range(kp1)]
                Nc = [[0, 0, 0] for _ in range(kp1)]
                S = [
                    [[None, None] for _ in range(kp1)] for _ in range(nv)
                ]
                # pointwise: each BSK operand is a [1, L] ROW broadcast
                # across gate sublanes (native splat) — the fs kernel's
                # 53%-of-time lane-splat becomes ~free here
                splits = [
                    _split256(fwd_pi[r][tp]) for r in range(rows_tot)
                ]
                for v in range(1, nv):
                    for c2 in range(kp1):
                        base = (
                            (((v - 1) * kp1 + c2) * NP + pi) * TP + tp
                        ) * rows_tot
                        slo = shi = None
                        cc = 0
                        for r in range(rows_tot):
                            if "nobsk" in ablate:  # probe: load cost
                                b = jnp.float32(3.0 + r + v)
                            else:
                                b = jnp.broadcast_to(
                                    bsk_ref[0][base + r : base + r + 1, :],
                                    (G, L),
                                )
                            flo, fhi = splits[r]
                            plo = flo * b
                            phi = fhi * b
                            slo = plo if slo is None else slo + plo
                            shi = phi if shi is None else shi + phi
                            cc += 1
                            if cc == chunk and r + 1 < rows_tot:
                                slo = _redfbt(slo, p, ip)
                                shi = _redfbt(shi, p, ip)
                                cc = 1
                        S[v][c2][0], S[v][c2][1] = slo, shi
                # subset combination (same accumulation order as fs)
                for v in range(1, nv):
                    for c2 in range(kp1):
                        tlo_ = _redfbt(S[v][c2][0], p, ip)
                        thi_ = _redfbt(S[v][c2][1], p, ip)
                        d, nn = D[c2], Nc[c2]
                        if "nogmul" in ablate:  # probe: subset cost
                            if d[0] is None:
                                d[0], d[1] = tlo_, thi_
                            else:
                                d[0] = d[0] + tlo_
                                d[1] = d[1] + thi_
                            continue
                        if d[1] is not None and nn[1] + 2 > dchunk:
                            d[1] = _redfbt(d[1], p, ip)
                            nn[1] = 0
                        if d[0] is not None and nn[0] + 1 > dchunk:
                            d[0] = _redfbt(d[0], p, ip)
                            nn[0] = 0
                        if d[2] is not None and nn[2] + 1 > dchunk:
                            d[2] = _redfbt(d[2], p, ip)
                            nn[2] = 0
                        p0l, p1l = pvt[v]
                        if d[0] is None:
                            d[0] = p0l * tlo_
                            d[1] = p1l * tlo_ + p0l * thi_
                        else:
                            d[0] = d[0] + p0l * tlo_
                            d[1] = d[1] + p1l * tlo_ + p0l * thi_
                        d[2] = (
                            p1l * thi_
                            if d[2] is None
                            else d[2] + p1l * thi_
                        )
                        nn[0] += 1
                        nn[1] += 2
                        nn[2] += 1
                for c2 in range(kp1):
                    d0, d1, d2 = D[c2]
                    if d2 is None:
                        u = _redfbt(d1, p, ip)
                    else:
                        u = _redfbt(
                            d1 + _redfb(256.0 * _redfbt(d2, p, ip), p, ip),
                            p, ip,
                        )
                    conv_pi[c2][tp] = _redfbt(
                        d0 + _redfb(256.0 * u, p, ip), p, ip
                    )

            if "noptw" in ablate:
                conv_pi = [
                    [fwd_pi[0][tp] for tp in range(TP)] for _ in range(kp1)
                ]
            # inverse NTT for this prime (kp1 polys along sublanes)
            xs2 = []
            for tp in range(TP):
                stacked = jnp.concatenate(
                    [conv_pi[c][tp] for c in range(kp1)], axis=0
                )  # [kp1*G, L] balanced f32
                if "noimm" in ablate:  # probe: inverse matmul cost
                    ob = stacked
                else:
                    ob = _mmL_bal(
                        stacked, w2fi_ref[pi, tp, 0], w2fi_ref[pi, tp, 1],
                        p, ip,
                    )
                i32 = ob.astype(jnp.int32)
                xs2.append(
                    jnp.where(i32 < 0, i32 + p, i32).astype(jnp.uint32)
                )
            inv_res.append(
                xs2 if "noinv8" in ablate else _ts_inv8(xs2, ISTW, pi, p)
            )

        for c in range(kp1):
            for tp in range(TP):
                res = [
                    inv_res[pi][tp][c * G : (c + 1) * G, :]
                    for pi in range(NP)
                ]
                # additive-identity CMux: the v=0 GGSW-of-1 product is
                # exactly acc, so ADD the external product here
                if "nocrt" in ablate:  # probe: CRT recombination cost
                    acc_scr[c, tp] = (
                        acc_scr[c, tp] + res[0] + res[1] + res[2] + res[3]
                    )
                else:
                    acc_scr[c, tp] = acc_scr[c, tp] + _crt_fast(
                        res, CRT_W_MOD, CRT_FRAC, PROD_MOD
                    )

        @pl.when(j == n // g - 1)
        def _():
            out_ref[0] = acc_scr[...]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("params", "g_tile", "interpret", "ablate")
)
def blind_rotate_ts_mb(
    params: TfheParams,
    bsk,
    lwe_in,
    testv,
    g_tile: int = 512,
    interpret: bool = False,
    ablate: str = "",
):
    """Multi-bit MXU blind rotation, transposed-packed layout.

    bsk: mxu_server_key_ts(dsk). Same contract as blind_rotate_fs_mb."""
    from ..fhe import ops as fops

    N, k, n = params.N, params.k, params.n
    g = params.grouping
    N2 = N // N1
    L = 2 * N2
    kp1 = k + 1
    groups = n // g
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
    tiles = Gp // g_tile

    ts = _ts_tables(N)
    abar = fops.mod_switch(jnp, lwe_in[:, :n], N).astype(jnp.int32)
    bbar = fops.mod_switch(jnp, lwe_in[:, n], N)
    neg_b = (jnp.uint32(2 * N) - bbar) & jnp.uint32(2 * N - 1)
    body = fops.negacyclic_rotate(
        jnp, jnp.broadcast_to(testv, (Gp, N)), neg_b, N
    )
    # [Gp, N] -> [tiles, TP, G, L]: lane = half*N2 + jb, tile fA = half*4+tp
    body = body.reshape(tiles, g_tile, 2, TP, N2)
    body = jnp.transpose(body, (0, 3, 1, 2, 4)).reshape(
        tiles, TP, g_tile, L
    )[:, None]
    acc0 = jnp.concatenate(
        [jnp.zeros((tiles, k, TP, g_tile, L), jnp.uint32), body], axis=1
    )
    abar_t = jnp.transpose(abar.reshape(tiles, g_tile, n), (0, 2, 1))

    kernel = _make_kernel_ts_mb(
        params, g_tile, frozenset(ablate.split(",")) - {""}
    )

    def cmap(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda i, j, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM
        )

    nv3 = (1 << g) - 1
    RS = nv3 * kp1 * NP * TP * params.gadget_rows
    LOW = min(64, 2 * N)
    HBW = max(1, (2 * N) // LOW)
    out = pl.pallas_call(
        kernel,
        grid=(tiles, groups),
        in_specs=[
            pl.BlockSpec(
                (1, kp1, TP, g_tile, L), lambda i, j: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n, g_tile), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            cmap((NP, TP, 2, L, L)),
            cmap((NP, TP, 2, L, L)),
            cmap((NP, 2, LOW, N1 * N2)),
            cmap((NP, 2, HBW, N1 * N2)),
            pl.BlockSpec(
                (1, RS, L), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, kp1, TP, g_tile, L), lambda i, j: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (tiles, kp1, TP, g_tile, L), jnp.uint32
        ),
        scratch_shapes=[pltpu.VMEM((kp1, TP, g_tile, L), jnp.uint32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        acc0,
        abar_t,
        jnp.asarray(ts["w2fT"], dtype=jnp.bfloat16),
        jnp.asarray(ts["w2fiT"], dtype=jnp.bfloat16),
        jnp.asarray(ts["tloT"], dtype=jnp.bfloat16),
        jnp.asarray(ts["thiT"], dtype=jnp.bfloat16),
        bsk,
    )
    # [tiles, kp1, TP, G, L] -> [Gp, kp1, N] (inverse of the input packing)
    acc = out.reshape(tiles, kp1, TP, g_tile, 2, N2)
    acc = jnp.transpose(acc, (0, 3, 1, 4, 2, 5)).reshape(Gp, kp1, N)
    return acc[:G]
