"""Fused Pallas blind rotation with the MXU 4-step NTT (N = 8 x 128).

Same schedule as ops/pallas_pbs.py (grid (tiles, n), VMEM-resident
accumulator, auto-pipelined BSK), but with the transform work mapped onto
the MXU. Math and tables: ops/mxu_ntt.py; results are bit-identical to the
jnp pipeline (the BSK is the standard NTT-domain key lane-permuted by
`perm_from_std`).

Kernel data layout (chosen so every op is a Mosaic-legal idiom):
every polynomial batch lives as u32 [N2=128 (jB, sublanes), Gt*8 (lanes)],
lane index = gate * 8 + jA (g-major). Consequences:

- per-gate rotation amounts are pre-expanded host-side (np.repeat x8), so
  bit extraction needs no in-kernel relayout;
- per-jA constants (stage twiddles, twist, BSK slices) expand with
  `pltpu.repeat` — which is TILE-wise, matching g-major order exactly;
- the 8-point stage over jA works on 8-lane blocks with plain static rolls
  (butterfly reads never cross a gate's block);
- the 128-point stage contracts jB = SUBLANES: one left-matmul
  [128,128] @ [128, Gt*8*rows] per prime per int8 limb pair on the MXU;
- rotation: sublane rolls for the jB bits with a block-cyclic jA carry.

Coefficient mapping: poly index j = 128*jA + jB (ops/mxu_ntt.py order).
"""

from __future__ import annotations

import functools
import os

# perf-ablation switches (comma list): norot, nosub8, nomm, noptw, nogarner
ABLATE = set(os.environ.get("HELM_TPU_MXU_ABLATE", "").split(","))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fhe.modring import get_tables, primes_for
from ..params import TfheParams
from . import mxu_ntt
from .mxu_ntt import LOG_N1, N1

LOG2 = {1 << i: i for i in range(16)}


def _msub(a, b, p: int):
    return jnp.where(a < b, a - b + jnp.uint32(p), a - b)


def _madd(a, b, p: int):
    r = a + b
    return jnp.where(r >= p, r - jnp.uint32(p), r)


def _mshoup(a, w, w_sh, p: int):
    q = (a * w_sh) >> jnp.uint32(16)
    r = a * w - q * jnp.uint32(p)
    return jnp.where(r >= p, r - jnp.uint32(p), r)


def _redu24(t, p: int, inv_p: float):
    """u32 t < 2^24 -> t mod p via round-to-nearest f32 quotient.

    f32 is exact up to 2^24 and the quotient error is << 0.5, so q is off
    by at most 1 in either direction; two selects finish the reduction.
    """
    tf = t.astype(jnp.int32).astype(jnp.float32)
    q = jnp.floor(tf * inv_p + 0.5).astype(jnp.int32)
    r = t.astype(jnp.int32) - q * p
    r = jnp.where(r < 0, r + p, r).astype(jnp.uint32)
    return jnp.where(r >= p, r - jnp.uint32(p), r)


def _gmul(a, b, p: int, inv_p: float):
    """Generic (a*b) mod p for dynamic a, b in [0, p), p <= 2^16 + 1.

    Shoup needs a precomputed companion for one operand; for
    dynamic x dynamic products (the multi-bit subset polynomials) split b
    into 8-bit limbs so every partial product stays under 2^24.
    """
    bh = b >> jnp.uint32(8)
    bl = b & jnp.uint32(255)
    t1 = _redu24(a * bh, p, inv_p)
    t2 = _redu24(t1 << jnp.uint32(8), p, inv_p)
    t3 = _redu24(a * bl, p, inv_p)
    return _madd(t2, t3, p)


def _reduce_chain(s, max_terms: int, p: int):
    """Sum of < max_terms values each < p -> canonical [0, p)."""
    m = 1
    while m * 2 < max_terms:
        m *= 2
    while m >= 1:
        s = jnp.where(s >= m * p, s - jnp.uint32(m * p), s)
        m //= 2
    return s



def _digit_residues(d, bl: int, p: int, ip: float):
    """Signed gadget digit (int32, |d| <= 2^(bl-1)) -> residue in [0, p).

    Cheap single-select when the digit magnitude fits below the prime;
    the approximate-gadget mask base can be 2^16 (digits +-2^15), which
    exceeds the smallest NTT prime (12289) — reduce via _redu24 there."""
    if (1 << (bl - 1)) < p:
        return jnp.where(d < 0, d + p, d).astype(jnp.uint32)
    u = (d + jnp.int32(1 << 15)).astype(jnp.uint32)  # [0, 2^16]
    return _msub(_redu24(u, p, ip), jnp.uint32((1 << 15) % p), p)

def _rollS(x, s: int):  # sublanes (jB), axis -2
    return pltpu.roll(x, s % x.shape[-2], axis=x.ndim - 2)


def _rollL(x, s: int):  # lanes (jA*Gt + g), axis -1
    return pltpu.roll(x, s % x.shape[-1], axis=x.ndim - 1)


def _iotaS(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)


def _iotaL(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _block_roll(x, s: int):
    """Cyclic roll by s within each 8-lane (jA) block: out[.., g*8+jA] =
    x[.., g*8 + (jA - s) % 8]. Two static rolls + a lane-position select."""
    a = _rollL(x, s % N1)
    b = _rollL(x, (s % N1) - N1)
    pos = _iotaL(x.shape) % N1
    # pos >= s: source l-s is in-block via the +s roll; pos < s wraps via b
    return jnp.where(pos < (s % N1), b, a)


def _negacyclic_rotate(x, bits, N: int, gt: int):
    """x: u32 [N2, gt*8]; bits[b]: u32 [1, gt*8] per-gate bit vectors
    (pre-expanded). X^amt * x with amt = sum 2^b bits."""
    N2 = N // N1
    subl = _iotaS(x.shape)
    pos = _iotaL(x.shape) % N1  # jA within the gate's block
    # jB bits: sublane roll; wrapped sublanes borrow from jA-1 (block-cyclic,
    # negacyclic when jA-1 wraps past 0)
    for b in range(LOG2[N2]):
        s = 1 << b
        rolled = _rollS(x, s)
        carried = _block_roll(rolled, 1)
        carried = jnp.where(pos == 0, jnp.uint32(0) - carried, carried)
        rot = jnp.where(subl < s, carried, rolled)
        x = jnp.where(bits[b] == 1, rot, x)
    # jA bits: block-cyclic lane rolls with sign on wrapped positions
    for b in range(LOG_N1):
        s = 1 << b
        rolled = _block_roll(x, s)
        rot = jnp.where(pos < s, jnp.uint32(0) - rolled, rolled)
        x = jnp.where(bits[LOG2[N2] + b] == 1, rot, x)
    # X^N = -1
    return jnp.where(bits[LOG2[N]] == 1, jnp.uint32(0) - x, x)


def _decompose(v, base_log: int, levels: int):
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


def _sublane8_fwd(x, stw_pi, stw_sh_pi, p: int, gt: int, e8f):
    """negacyclic-8 stages over the jA lane-blocks. x: [N2, 8*gt].

    stw_pi: [3, 8] lane vectors (per stage, per jA) — matmul-expanded."""
    blockpos = _iotaL(x.shape) % N1
    for s in range(LOG_N1):
        t = N1 >> (s + 1)
        w = _expand8(stw_pi[s][None, :], e8f[:, : x.shape[-1]])
        w_sh = _expand8(stw_sh_pi[s][None, :], e8f[:, : x.shape[-1]])
        # butterfly reads stay inside each 8-lane block (see module docs)
        t1 = _mshoup(_rollL(x, -t), w, w_sh, p)
        low = _madd(x, t1, p)
        high = _rollL(_msub(x, t1, p), t)
        x = jnp.where((blockpos % (2 * t)) < t, low, high)
    return x


def _sublane8_inv(x, istw_pi, istw_sh_pi, p: int, gt: int, e8f):
    reps = x.shape[-1] // N1
    blockpos = _iotaL(x.shape) % N1
    for s in range(LOG_N1):
        t = 1 << s
        w = _expand8(istw_pi[s][None, :], e8f[:, : x.shape[-1]])
        w_sh = _expand8(istw_sh_pi[s][None, :], e8f[:, : x.shape[-1]])
        v = _rollL(x, -t)
        low = _madd(x, v, p)
        high = _rollL(_mshoup(_msub(x, v, p), w, w_sh, p), t)
        x = jnp.where((blockpos % (2 * t)) < t, low, high)
    return x


def _expand8(x2d, e8f):
    """Lane expansion [R, 8] -> [R, L] (pattern-tiled) via one f32 matmul.

    Replaces pltpu.repeat on skinny [.., 8]-lane sources, which Mosaic
    lowers ~100x slower than an MXU pass. Values must be < 2^24 (true for
    all mod-p tables). e8f: f32 [8, L] with e8f[jA, g*8+jA] = 1.
    """
    # Split into two 8-bit limbs so the default (single-bf16-pass) matmul is
    # exact: integers <= 256 are bf16-representable, and the MXU accumulates
    # in f32. (A direct f32 dot is silently bf16-truncated; HIGHEST costs 6
    # passes.) Mosaic has no u32<->f32 casts; route through int32.
    xi = x2d.astype(jnp.int32)
    lo = (xi & 255).astype(jnp.float32)
    hi = (xi >> 8).astype(jnp.float32)

    def mm(a):
        return jax.lax.dot_general(
            a, e8f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

    return (mm(lo) + (mm(hi) << 8)).astype(jnp.uint32)


def _lane128_matmul(u, w2t0, w2t1, p: int, inv_p: float, c16: int, c16_sh: int):
    """(W2^T @ u) mod p: contraction over jB sublanes on the MXU.

    u: u32 [N2, L] in [0,p); w2t*: f32 [N2, N2] transposed balanced limb
    matrices (W = w0 + 256*w1, |w_i| < 128). All matmuls run in f32 — every
    partial product is integer-exact below 2^24 — so there is no int8
    packing relayout and the epilogue stays on native f32/u32 ops.
    """
    t32 = u.astype(jnp.int32)
    bal = jnp.where(t32 > p // 2, t32 - p, t32).astype(jnp.float32)
    a1 = jnp.floor(bal * (1.0 / 256.0) + 0.5)
    a0 = bal - 256.0 * a1  # |a0| <= 128, |a1| <= 128

    def mm(w, a):
        return jax.lax.dot_general(
            w, a, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    m00 = mm(w2t0, a0)
    m01 = mm(w2t1, a0)
    m10 = mm(w2t0, a1)
    m11 = mm(w2t1, a1)

    def redf(t):  # f32 integer-valued -> balanced mod p (f32, exact)
        q = jnp.floor(t * inv_p + 0.5)
        return t - q * p

    def to_u(t):  # balanced (|t| <= 1.5p) -> u32 in [0, p)
        r = (t.astype(jnp.int32) + 2 * p).astype(jnp.uint32)
        r = jnp.where(r >= 2 * p, r - jnp.uint32(2 * p), r)
        return jnp.where(r >= p, r - jnp.uint32(p), r)

    lo_u = to_u(redf(m00))
    mid_u = to_u(redf(m01 + m10))  # sum <= 2^22, exact
    hi_u = to_u(redf(m11))
    # weights 2^8 and 2^16 (mod p) applied as integer Shoup muls — f32
    # products would exceed the 2^24 exact-integer range
    c8, c8_sh = (1 << 8) % p, ((((1 << 8) % p) << 16) // p)
    r = _madd(lo_u, _mshoup(mid_u, jnp.uint32(c8), jnp.uint32(c8_sh), p), p)
    return _madd(r, _mshoup(hi_u, jnp.uint32(c16), jnp.uint32(c16_sh), p), p)


# --- balanced-signed f32 modular arithmetic -------------------------------
# The VPU runs f32 mul/fma at full rate while u32 multiplies lower to
# multi-op sequences, so the hot pointwise stage of the multi-bit kernel
# works on balanced representatives (|x| <= p/2) kept in f32. All values
# are integers; every product/sum is kept below 2^24 so f32 is exact.


def _redfb(t, p: int, inv_p: float):
    """Integer-valued f32 -> balanced mod p. Exact for |t| < 2^24. The f32
    quotient may be off by one near half-integer ratios, so the result is
    only bounded by 1.5*p — apply _tighten where a strict p/2 bound feeds
    a product."""
    q = jnp.floor(t * inv_p + 0.5)
    return t - q * p


def _tighten(t, p: int):
    """Balanced-ish f32 (|t| <= 1.5*p) -> strictly |out| <= p//2."""
    hp = float(p // 2)
    t = jnp.where(t > hp, t - p, t)
    return jnp.where(t < -hp, t + p, t)


def _redfbt(t, p: int, inv_p: float):
    return _tighten(_redfb(t, p, inv_p), p)


def _split256(t):
    """Integer f32 -> (lo, hi) with t = lo + 256*hi, |lo| <= 128."""
    hi = jnp.floor(t * (1.0 / 256.0) + 0.5)
    return t - 256.0 * hi, hi


def _to_bal_f32(u, p: int):
    """u32 in [0, p) -> balanced f32 in [-p//2, p//2]."""
    t32 = u.astype(jnp.int32)
    return jnp.where(t32 > p // 2, t32 - p, t32).astype(jnp.float32)


def _mm128_bal(bal, w0, w1, p: int, inv_p: float):
    """(W^T @ bal) mod p, balanced f32 in/out (|.| <= p//2).

    w0/w1: [N2, N2] balanced 8-bit limb matrices, stored bf16 (W = w0 +
    256*w1, |w_i| <= 128 — integers <= 256 are bf16-exact, and the MXU
    accumulates in f32). REQUIRES |bal| <= p//2 so the input limbs also
    stay <= 128; they are cast to bf16 explicitly (the default f32
    dot_general runs one bf16 pass anyway — the cast halves the VMEM
    traffic without changing the math; CPU interpret stays exact too).

    Epilogue: 4 Barrett reductions (lo/mid/hi folded with running bounds
    in the comments; every intermediate < 2^24, f32-exact; N2 <= 256)."""
    a0, a1 = _split256(bal)
    a0 = a0.astype(jnp.bfloat16)
    a1 = a1.astype(jnp.bfloat16)

    def mm(w, a):
        return jax.lax.dot_general(
            w, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    m00 = mm(w0, a0)  # |.| <= N2*128*128 <= 2^22
    mid = mm(w1, a0) + mm(w0, a1)  # <= 2^23
    m11 = mm(w1, a1)
    hi = _redfbt(m11, p, inv_p)  # <= p//2
    u = _redfb(mid, p, inv_p)  # <= 1.5p
    s1 = _redfbt(u + 256.0 * hi, p, inv_p)  # in <= 1.5p + 2^23 < 2^24
    return _redfbt(m00 + 256.0 * s1, p, inv_p)  # in <= 2^22 + 2^23 < 2^24


def _lane128_matmul_fwd_bal(u, w0, w1, p: int, inv_p: float):
    """u32 [0, p) -> (W2^T @ u) mod p as balanced f32 (|out| <= p//2),
    feeding the f32 pointwise stage directly — no u32 round trip and no
    integer-Shoup epilogue."""
    return _mm128_bal(_to_bal_f32(u, p), w0, w1, p, inv_p)


def _lane128_matmul_inv_bal(bal, w0, w1, p: int, inv_p: float):
    """Balanced f32 (|in| <= p//2) -> (W2^T @ in) mod p as u32 in [0, p)."""
    ob = _mm128_bal(bal, w0, w1, p, inv_p)
    i = ob.astype(jnp.int32)
    return jnp.where(i < 0, i + p, i).astype(jnp.uint32)


def _crt_fast(res, w_mod, fracs, prod_mod):
    """CRT residues -> value mod 2^32 via float-corrected reconstruction.

    x = sum r_i * W_i - k * P with W_i = (P/p_i) * [(P/p_i)^-1 mod p_i] and
    k = round(sum r_i * (W_i / P)). Exact: |x| <= 2^53 << P/2, so the
    fractional sum sits at least ~2^-6 away from half-integers while the
    f32 error is < 2^-6. Half the ops of Garner mixed-radix.
    """
    # Mosaic lacks u32<->f32 casts; residues are < 2^17 so int32 is safe
    acc = res[0] * jnp.uint32(w_mod[0])
    facc = res[0].astype(jnp.int32).astype(jnp.float32) * fracs[0]
    for i in range(1, 4):
        acc = acc + res[i] * jnp.uint32(w_mod[i])
        facc = facc + res[i].astype(jnp.int32).astype(jnp.float32) * fracs[i]
    k = jnp.floor(facc + 0.5).astype(jnp.int32).astype(jnp.uint32)
    return acc - k * jnp.uint32(prod_mod)


def _garner(res, g, primes):
    p0, p1, p2, p3 = primes
    r0, r1, r2, r3 = res
    u32 = jnp.uint32

    def ms(a, w, w_sh, p):
        return _mshoup(a, u32(w), u32(w_sh), p)

    v0 = r0
    v1 = ms(_msub(r1, v0, p1), g.inv_p0_mod_p1, g.inv_p0_mod_p1_sh, p1)
    m2 = _madd(v0, ms(v1, g.p0_mod_p2, g.p0_mod_p2_sh, p2), p2)
    v2 = ms(_msub(r2, m2, p2), g.inv_p01_mod_p2, g.inv_p01_mod_p2_sh, p2)
    m3 = _madd(v0, ms(v1, g.p0_mod_p3, g.p0_mod_p3_sh, p3), p3)
    m3 = _madd(m3, ms(v2, g.p01_mod_p3, g.p01_mod_p3_sh, p3), p3)
    v3 = ms(_msub(r3, m3, p3), g.inv_p012_mod_p3, g.inv_p012_mod_p3_sh, p3)
    x = v0 + u32(p0) * (v1 + u32(p1) * (v2 + u32(p2) * v3))
    return jnp.where(v3 > u32(g.half_p3), x - u32(g.prod_mod_q), x)


def _make_kernel(params: TfheParams, g_tile: int):
    N, k, n = params.N, params.k, params.n
    N2 = N // N1
    kp1 = k + 1
    gadgets = params.component_gadgets  # per-component (base_log, levels)
    rows_tot = params.gadget_rows
    tab = get_tables(N)
    PRIMES = tuple(int(p) for p in tab.primes)
    INV_P = tuple(1.0 / p for p in PRIMES)
    C16 = tuple((1 << 16) % p for p in PRIMES)
    C16_SH = tuple((((1 << 16) % p) << 16) // p for p in PRIMES)
    garner_c = tab.garner
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
    L = N1 * g_tile  # lanes per poly batch

    def kernel(
        acc0_ref,  # [kp1, N2, L]
        abar_ref,  # [1, n, 128] int32 (lane = gate)
        stw_ref,  # [NP, 3, 8]
        stw_sh_ref,
        istw_ref,
        istw_sh_ref,
        tw_ref,  # [NP, N2, 8] twist (fA in lanes)
        tw_sh_ref,
        twi_ref,
        twi_sh_ref,
        w2t_ref,  # [NP, 2, N2, N2] f32 balanced limbs, transposed
        w2ti_ref,
        e8_ref,  # [8, wide] f32 lane-expansion matrix
        bsk_ref,  # [1, rows, kp1, NP, N2, 8] (mxu order, fB sublanes)
        bsk_sh_ref,
        out_ref,  # [kp1, N2, L]
        acc_scr,
    ):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_scr[...] = acc0_ref[0]

        # rotation amounts pre-expanded host-side to g-major (x8) order
        a_i = abar_ref[0, j, :]  # [L] lane vector
        bits = [
            ((a_i >> b) & 1).astype(jnp.uint32)[None, :]
            for b in range(LOG2[2 * N] + 1)
        ]

        e8f = e8_ref[...]
        acc = [acc_scr[c] for c in range(kp1)]  # [N2, L] each
        if "norot" in ABLATE:
            rot = [a + jnp.uint32(123) for a in acc]
        else:
            rot = [_negacyclic_rotate(a, bits, N, g_tile) for a in acc]
        digs = []
        dig_bl = []
        for c in range(kp1):
            bl_c, lv_c = gadgets[c]
            digs.extend(_decompose(rot[c] - acc[c], bl_c, lv_c))
            dig_bl.extend([bl_c] * lv_c)

        conv_ntt = [[None] * len(PRIMES) for _ in range(kp1)]
        fwd = [[None] * len(PRIMES) for _ in range(rows_tot)]
        for pi, p in enumerate(PRIMES):
            stacked = jnp.concatenate(
                [
                    _digit_residues(d, bl, p, INV_P[pi])
                    for d, bl in zip(digs, dig_bl)
                ],
                axis=1,
            )  # [N2, rows*L]
            if "nosub8" in ABLATE:
                s1 = stacked
            else:
                s1 = _sublane8_fwd(
                    stacked,
                    [stw_ref[pi, s] for s in range(LOG_N1)],
                    [stw_sh_ref[pi, s] for s in range(LOG_N1)],
                    p,
                    g_tile,
                    e8f,
                )
            twl = _expand8(tw_ref[pi], e8f)
            twl_sh = _expand8(tw_sh_ref[pi], e8f)
            s1 = _mshoup(s1, twl, twl_sh, p)
            if "nomm" in ABLATE:
                f = s1
            else:
                f = _lane128_matmul(
                    s1, w2t_ref[pi, 0], w2t_ref[pi, 1], p, INV_P[pi],
                    C16[pi], C16_SH[pi],
                )
            for r in range(rows_tot):
                fwd[r][pi] = f[:, r * L : (r + 1) * L]
        nslab = rows_tot * kp1 * len(PRIMES)
        bsk_exp = _expand8(
            bsk_ref[0].reshape(nslab * N2, N1), e8f[:, :L]
        ).reshape(nslab, N2, L)
        bsk_sh_exp = _expand8(
            bsk_sh_ref[0].reshape(nslab * N2, N1), e8f[:, :L]
        ).reshape(nslab, N2, L)
        for c2 in range(kp1):
            for pi, p in enumerate(PRIMES):
                if "noptw" in ABLATE:
                    conv_ntt[c2][pi] = fwd[0][pi]
                    continue
                s = None
                for r in range(rows_tot):
                    idx = (r * kp1 + c2) * len(PRIMES) + pi
                    t = _mshoup(fwd[r][pi], bsk_exp[idx], bsk_sh_exp[idx], p)
                    s = t if s is None else s + t
                m = 4
                while m >= 1:
                    s = jnp.where(s >= m * p, s - jnp.uint32(m * p), s)
                    m //= 2
                conv_ntt[c2][pi] = s
        # inverse: both polys at once per prime
        outs = []
        for pi, p in enumerate(PRIMES):
            stacked = jnp.concatenate(
                [conv_ntt[c][pi] for c in range(kp1)], axis=1
            )  # [N2, kp1*L]
            if "noinv" in ABLATE:
                outs.append(stacked)
                continue
            v = _lane128_matmul(
                stacked, w2ti_ref[pi, 0], w2ti_ref[pi, 1], p, INV_P[pi],
                C16[pi], C16_SH[pi],
            )
            twl = _expand8(twi_ref[pi], e8f[:, : kp1 * L])
            twl_sh = _expand8(twi_sh_ref[pi], e8f[:, : kp1 * L])
            v = _mshoup(v, twl, twl_sh, p)
            v = _sublane8_inv(
                v,
                [istw_ref[pi, s] for s in range(LOG_N1)],
                [istw_sh_ref[pi, s] for s in range(LOG_N1)],
                p,
                g_tile,
                e8f,
            )
            outs.append(v)
        for c in range(kp1):
            res = [outs[pi][:, c * L : (c + 1) * L] for pi in range(len(PRIMES))]
            if "nogarner" in ABLATE:
                acc_scr[c] = acc[c] + res[0]
            elif "oldgarner" in ABLATE:
                acc_scr[c] = acc[c] + _garner(res, garner_c, PRIMES)
            else:
                acc_scr[c] = acc[c] + _crt_fast(
                    res, CRT_W_MOD, CRT_FRAC, PROD_MOD
                )

        @pl.when(j == n - 1)
        def _():
            out_ref[0] = acc_scr[...]

    return kernel


def _make_kernel_mb(params: TfheParams, g_tile: int, ablate: frozenset = frozenset()):
    """Multi-bit (grouping g) blind-rotation kernel: one external product per
    group of g mask elements (reference multi-bit PBS; see
    fhe/pbs_jnp.py:blind_rotate_multibit for the jnp reference semantics).

    Differences from the single-bit kernel:
    - no rotation stage: the effective GGSW already encodes X^{sum a_i s_i},
      so the accumulator is decomposed directly and REPLACED by the product;
    - per group, NTT(X^{a_i}) is built by a bit ladder over precomputed
      monomial tables (host-pre-expanded to lane layout), and the subset
      polynomials P_v = prod_{i in v}(X^{a_i} - 1) come from elementwise
      generic modmuls;
    - the pointwise stage computes T_v = sum_r f_r (.) BSK_v[r, c] (Shoup,
      since the BSK is precomputed) and combines T_0 + sum_v P_v (.) T_v,
      needing only (2^g - 1) * (k+1) generic modmuls per prime per step.
    """
    N, k, n = params.N, params.k, params.n
    g = params.grouping
    nv = 1 << g
    N2 = N // N1
    kp1 = k + 1
    gadgets = params.component_gadgets  # per-component (base_log, levels)
    rows_tot = params.gadget_rows
    L2N = N.bit_length()  # exponents live in [0, 2N)
    tab = get_tables(N)
    PRIMES = tuple(int(p) for p in tab.primes)
    NP = len(PRIMES)
    INV_P = tuple(1.0 / p for p in PRIMES)
    C16 = tuple((1 << 16) % p for p in PRIMES)
    C16_SH = tuple((((1 << 16) % p) << 16) // p for p in PRIMES)
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
    L = N1 * g_tile

    def kernel(
        acc0_ref,  # [kp1, N2, L]
        abar_ref,  # [1, n, L] int32 (pre-expanded x8, g-major lanes)
        stw_ref,
        stw_sh_ref,
        istw_ref,
        istw_sh_ref,
        tw_ref,
        tw_sh_ref,
        twi_ref,
        twi_sh_ref,
        w2t_ref,
        w2ti_ref,
        e8_ref,
        mono_ref,  # [NP, L2N, N2, L] u32, lane-expanded monomial tables
        mono_sh_ref,
        bsk_ref,  # [1, nv, rows, kp1, NP, N2, 8] (mxu order)
        bsk_sh_ref,
        out_ref,
        acc_scr,
    ):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_scr[...] = acc0_ref[0]

        e8f = e8_ref[...]
        acc = [acc_scr[c] for c in range(kp1)]

        # --- monomial NTTs M_i = NTT(X^{a_i}) per group member, per prime
        ones_u = jnp.ones((N2, L), jnp.uint32)
        M = [[None] * NP for _ in range(g)]
        for i in range(g):
            a_i = abar_ref[0, g * j + i, :]  # [L] lane vector
            bits = [
                ((a_i >> b) & 1).astype(jnp.uint32)[None, :]
                for b in range(L2N)
            ]
            for pi, p in enumerate(PRIMES):
                if "noladder" in ablate:
                    M[i][pi] = mono_ref[pi, i]
                    continue
                m = jnp.where(bits[0] == 1, mono_ref[pi, 0], ones_u)
                for b in range(1, L2N):
                    m2 = _mshoup(m, mono_ref[pi, b], mono_sh_ref[pi, b], p)
                    m = jnp.where(bits[b] == 1, m2, m)
                M[i][pi] = m

        # --- subset polynomials P_v = prod_{i in v} (M_i - 1), v = 1..nv-1
        pv = {}
        for v in range(1, nv):
            idxs = [i for i in range(g) if (v >> i) & 1]
            if len(idxs) == 1:
                pv[v] = [
                    _msub(M[idxs[0]][pi], jnp.uint32(1), p)
                    for pi, p in enumerate(PRIMES)
                ]
            else:
                cur = pv[1 << idxs[0]]
                for i in idxs[1:]:
                    nxt = pv[1 << i]
                    cur = [
                        _gmul(cur[pi], nxt[pi], p, INV_P[pi])
                        for pi, p in enumerate(PRIMES)
                    ]
                pv[v] = cur

        # --- decompose acc directly (the external product REPLACES it)
        digs = []
        dig_bl = []
        for c in range(kp1):
            bl_c, lv_c = gadgets[c]
            digs.extend(_decompose(acc[c], bl_c, lv_c))
            dig_bl.extend([bl_c] * lv_c)

        # --- forward NTT of the decomposed rows (same stages as single-bit)
        fwd = [[None] * NP for _ in range(rows_tot)]
        for pi, p in enumerate(PRIMES):
            stacked = jnp.concatenate(
                [
                    _digit_residues(d, bl, p, INV_P[pi])
                    for d, bl in zip(digs, dig_bl)
                ],
                axis=1,
            )  # [N2, rows*L]
            s1 = _sublane8_fwd(
                stacked,
                [stw_ref[pi, s] for s in range(LOG_N1)],
                [stw_sh_ref[pi, s] for s in range(LOG_N1)],
                p,
                g_tile,
                e8f,
            )
            twl = _expand8(tw_ref[pi], e8f)
            twl_sh = _expand8(tw_sh_ref[pi], e8f)
            s1 = _mshoup(s1, twl, twl_sh, p)
            f = _lane128_matmul(
                s1, w2t_ref[pi, 0], w2t_ref[pi, 1], p, INV_P[pi],
                C16[pi], C16_SH[pi],
            )
            for r in range(rows_tot):
                fwd[r][pi] = f[:, r * L : (r + 1) * L]

        # --- pointwise: T_v = sum_r f_r (.) BSK_v[r, c2]; then
        #     result = sum_{v>=1} P_v (.) T_v (identity added post-CRT)
        nslab = (nv - 1) * rows_tot * kp1 * NP
        if "noexp" in ablate:
            bsk_exp = jnp.ones((nslab, N2, L), jnp.uint32)
            bsk_sh_exp = jnp.ones((nslab, N2, L), jnp.uint32)
        else:
            bsk_exp = _expand8(
                bsk_ref[0].reshape(nslab * N2, N1), e8f[:, :L]
            ).reshape(nslab, N2, L)
            bsk_sh_exp = _expand8(
                bsk_sh_ref[0].reshape(nslab * N2, N1), e8f[:, :L]
            ).reshape(nslab, N2, L)
        conv_ntt = [[None] * NP for _ in range(kp1)]
        for c2 in range(kp1):
            for pi, p in enumerate(PRIMES):
                if "noptw" in ablate:
                    conv_ntt[c2][pi] = fwd[0][pi]
                    continue
                s = None
                for v in range(1, nv):
                    t_acc = None
                    for r in range(rows_tot):
                        idx = (
                            ((v - 1) * rows_tot + r) * kp1 + c2
                        ) * NP + pi
                        t = _mshoup(
                            fwd[r][pi], bsk_exp[idx], bsk_sh_exp[idx], p
                        )
                        t_acc = t if t_acc is None else t_acc + t
                    t_acc = _reduce_chain(t_acc, rows_tot + 1, p)
                    if "nogmul" in ablate:
                        term = _madd(pv[v][pi], t_acc, p)
                    else:
                        term = _gmul(pv[v][pi], t_acc, p, INV_P[pi])
                    s = term if s is None else _madd(s, term, p)
                conv_ntt[c2][pi] = s

        # --- inverse NTT + CRT; the external product is ADDED to the
        # accumulator (additive-identity CMux; v=0 is never keyed)
        outs = []
        for pi, p in enumerate(PRIMES):
            stacked = jnp.concatenate(
                [conv_ntt[c][pi] for c in range(kp1)], axis=1
            )
            v = _lane128_matmul(
                stacked, w2ti_ref[pi, 0], w2ti_ref[pi, 1], p, INV_P[pi],
                C16[pi], C16_SH[pi],
            )
            twl = _expand8(twi_ref[pi], e8f[:, : kp1 * L])
            twl_sh = _expand8(twi_sh_ref[pi], e8f[:, : kp1 * L])
            v = _mshoup(v, twl, twl_sh, p)
            v = _sublane8_inv(
                v,
                [istw_ref[pi, s] for s in range(LOG_N1)],
                [istw_sh_ref[pi, s] for s in range(LOG_N1)],
                p,
                g_tile,
                e8f,
            )
            outs.append(v)
        for c in range(kp1):
            res = [outs[pi][:, c * L : (c + 1) * L] for pi in range(NP)]
            acc_scr[c] = acc[c] + _crt_fast(
                res, CRT_W_MOD, CRT_FRAC, PROD_MOD
            )

        @pl.when(j == n // g - 1)
        def _():
            out_ref[0] = acc_scr[...]

    return kernel


def _fs_fwd8(xs, stw, pi: int, p: int):
    """Negacyclic-8 CT stages across the fA tiles (Python-unrolled
    butterflies, scalar Shoup twiddles). xs: list of N1 [*, G] tiles."""
    for s in range(LOG_N1):
        t = N1 >> (s + 1)
        ys = [None] * N1
        for i0 in range(0, N1, 2 * t):
            for i in range(i0, i0 + t):
                w = int(stw[0][pi, s, i])
                wsh = int(stw[1][pi, s, i])
                t1 = _mshoup(xs[i + t], jnp.uint32(w), jnp.uint32(wsh), p)
                ys[i] = _madd(xs[i], t1, p)
                ys[i + t] = _msub(xs[i], t1, p)
        xs = ys
    return xs


def _fgmul(a, b, p: int, ip: float):
    """Balanced-f32 modmul: |a|,|b| <= p//2 + 1 -> balanced |out| <= p//2.

    Splits a into 8-bit limbs so every partial product stays exactly
    representable: |a0*b| <= 128*(p//2+1) < 2^24, |a1*b| likewise."""
    a0, a1 = _split256(a)
    return _redfbt(a0 * b + 256.0 * _redfbt(a1 * b, p, ip), p, ip)


def _fs_inv8(xs, istw, pi: int, p: int):
    """GS inverse stages across the fA tiles (mirror of _fs_fwd8)."""
    for s in range(LOG_N1):
        t = 1 << s
        ys = [None] * N1
        for i0 in range(0, N1, 2 * t):
            for i in range(i0, i0 + t):
                w = int(istw[0][pi, s, i])
                wsh = int(istw[1][pi, s, i])
                ys[i] = _madd(xs[i], xs[i + t], p)
                ys[i + t] = _mshoup(
                    _msub(xs[i], xs[i + t], p),
                    jnp.uint32(w),
                    jnp.uint32(wsh),
                    p,
                )
        xs = ys
    return xs


def _make_kernel_fs_mb(
    params: TfheParams,
    g_tile: int,
    ablate: frozenset = frozenset(),
    tsptw: bool = False,
):
    """Multi-bit blind rotation in the frequency-in-sublanes layout.

    Motivation (measured): in the gate-major lane layout every per-frequency
    constant (BSK slab, monomial table, twist) must be lane-expanded from
    [.., 8] patterns - K=8 matmuls at ~6% MXU utilization, ~52% of kernel
    time at grouping 2. Here each polynomial is N1=8 tiles of
    [N2 (freq, sublanes), G (gates, lanes)], so per-frequency constants are
    static [N2, 1] column slices broadcast across lanes (native splat) and
    per-gate selection bits stay [1, G] row broadcasts. The 8-point NTT
    stage degenerates to Python-unrolled butterflies with *scalar* Shoup
    twiddles; the 128-point stage is the same [128,128] f32-limb matmul
    with the decomposition rows concatenated along lanes.

    The external-product pointwise stage (the hot loop: nv * rows products
    per tile) runs entirely in balanced-signed f32: the forward-NTT rows
    are split once into 8-bit limb pairs and the BSK stays a single
    balanced f32 value per entry, so each term costs ONE [N2,1] column
    broadcast + 2 fma, with Barrett reductions deferred to once per
    (v, c2) — f32 fma is full-rate on the VPU while u32 multiplies lower
    to multi-op sequences. Monomials NTT(X^a) are selected by one-hot
    matmuls against tiny per-tile tables on the MXU (X^a =
    X^(a%64) * X^(64*(a/64))), and the subset polynomials P_v stay in
    balanced f32 (_fgmul), so values cross u32<->f32 only at the
    8-point-NTT boundaries.
    """
    N, k, n = params.N, params.k, params.n
    g = params.grouping
    nv = 1 << g
    N2 = N // N1
    kp1 = k + 1
    gadgets = params.component_gadgets  # per-component (base_log, levels)
    rows_tot = params.gadget_rows
    L2N = N.bit_length()
    tab = get_tables(N)
    PRIMES = tuple(int(p) for p in tab.primes)
    NP = len(PRIMES)
    INV_P = tuple(1.0 / p for p in PRIMES)
    C16 = tuple((1 << 16) % p for p in PRIMES)
    C16_SH = tuple((((1 << 16) % p) << 16) // p for p in PRIMES)
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
    G = g_tile  # gates per tile batch (lanes)
    t_host = mxu_ntt.mxu_tables(N)
    STW = (t_host["stage_tw"], t_host["stage_tw_sh"])
    ISTW = (t_host["istage_tw"], t_host["istage_tw_sh"])

    def kernel(
        acc0_ref,  # [kp1, N1, N2, G]
        abar_ref,  # [1, n, G] int32
        w2f_ref,  # [NP, N1, 2, N2, N2] fwd matmul with twist folded in
        w2fi_ref,  # [NP, N1, 2, N2, N2] inv matmul with twist folded in
        tlo_ref,  # [NP, 2, N1*N2, LOW] monomial one-hot limb tables
        thi_ref,  # [NP, 2, N1*N2, 2N/LOW]
        bsk_ref,  # f32 [1, N2, nv*rows*kp1*NP*N1], balanced |B| <= p//2
        out_ref,  # [kp1, N1, N2, G]
        acc_scr,  # [kp1, N1, N2, G]
    ):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_scr[...] = acc0_ref[0]

        def col(ref2d, c, width=G):
            # static [N2, 1] column -> broadcast across gate lanes.
            # HELM_TPU_FS_IMPLICIT_COL=1 leaves the broadcast to the
            # consuming multiply (A/B probe for the BSK-load stage).
            s = ref2d[:, c : c + 1]
            if "implcol" in ablate or os.environ.get(
                "HELM_TPU_FS_IMPLICIT_COL"
            ) == "1":
                return s
            return jnp.broadcast_to(s, (N2, width))

        # --- per-gate one-hot selectors for NTT(X^a): X^a =
        # X^(a%LOW) * X^(LOW*(a/LOW)); each factor is a column select from
        # a tiny limb table, done as an MXU matmul against the member's
        # one-hot matrix (exact: one-hot picks a single <=128 limb).
        LOW = min(64, 2 * N)
        HBW = max(1, (2 * N) // LOW)

        def ohmm(tref, oh):
            return jax.lax.dot_general(
                tref, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        ohs = []
        for i in range(g):
            a_i = abar_ref[0, g * j + i, :]  # [G] lane vector, [0, 2N)
            alo = (a_i & (LOW - 1))[None, :]
            ahi = (a_i >> LOG2[LOW])[None, :]
            # one-hot selectors in bf16 (0/1 exact; matches the bf16 tables)
            ohs.append((
                (
                    jax.lax.broadcasted_iota(jnp.int32, (LOW, G), 0)
                    == alo
                ).astype(jnp.bfloat16),
                (
                    jax.lax.broadcasted_iota(jnp.int32, (HBW, G), 0)
                    == ahi
                ).astype(jnp.bfloat16),
            ))

        # --- decompose acc (the external product REPLACES it)
        # digs[t][r]: int32 [N2, G] digit of row r, tile t
        def _digits():
            digs = [[] for _ in range(N1)]
            for c in range(kp1):
                bl_c, lv_c = gadgets[c]
                for t in range(N1):
                    if "nodec" in ablate:  # probe: decomposition cost
                        d = (acc_scr[c, t] >> jnp.uint32(24)).astype(
                            jnp.int32
                        )
                        digs[t].extend([d] * lv_c)
                    else:
                        digs[t].extend(_decompose(acc_scr[c, t], bl_c, lv_c))
            return digs

        # "digrec": recompute the digits inside each prime section instead
        # of holding all rows_tot*N1 int32 tiles live across the unrolled
        # prime loop — a few shifts per level vs ~25% of the VMEM peak at
        # N=2048 (acc_scr is only rewritten at the CRT stage, so re-reading
        # it per prime is sound)
        digs = None if "digrec" in ablate else _digits()

        # iota-built (constant-folding) {0,1,256} expansion matrix for the
        # MXU BSK-column expansion: e_rg[i, r*G+g] = [i==r] + 256*[i-rows==r]
        ei = jax.lax.broadcasted_iota(
            jnp.int32, (2 * rows_tot, rows_tot * G), 0
        )
        eb = (
            jax.lax.broadcasted_iota(
                jnp.int32, (2 * rows_tot, rows_tot * G), 1
            )
            // G
        )
        e_rg = jnp.where(ei == eb, 1.0, 0.0) + jnp.where(
            ei - rows_tot == eb, 256.0, 0.0
        )

        # --- ONE PRIME AT A TIME: fwd NTT -> monomials/subsets per tile
        # -> pointwise -> inverse NTT, so only this prime's fwd rows
        # (rows_tot*N1 tiles) and the small per-tile working set are live
        # — the all-primes all-subsets form held ~3x more and overflowed
        # VMEM. Everything balanced f32; the fwd row is limb-split once
        # per (pi, t) and feeds all nv*kp1 pointwise terms against the
        # single-f32 BSK slab (one column broadcast per term).
        inv_res = []  # [pi][t] -> [N2, kp1*G]
        # "crtacc": fold each prime's residues into running CRT partial
        # sums (u32 weighted sum + f32 fractional sum, the same two
        # accumulators _crt_fast builds — identical addition order, so
        # bit-identical results) instead of storing all NP residue sets
        # until the end: 2 live tile arrays per (c, t) vs NP u32 ones
        crt_i = [[None] * N1 for _ in range(kp1)]
        crt_f = [[None] * N1 for _ in range(kp1)]
        for pi, p in enumerate(PRIMES):
            ip = INV_P[pi]
            hp = p // 2
            # inner r-sum: terms <= hp*128; cap unreduced f32 at 2^24
            chunk = (1 << 24) // ((hp + 1) * 128)
            # D lanes: <= hp start, hp*128 per product, and the fold
            # adds one balanced (<= 1.5p) carry before reducing
            dchunk = ((1 << 24) - hp - 2 * p) // ((hp + 1) * 128)

            dl = _digits() if "digrec" in ablate else digs
            # per-row gadget bases (c-major, matching _digits' row order)
            row_bl = [bl for bl, lv in gadgets for _ in range(lv)]
            xs = []
            for t in range(N1):
                stacked = jnp.concatenate(
                    [
                        _digit_residues(d, bl, p, ip)
                        for d, bl in zip(dl[t], row_bl)
                    ],
                    axis=1,
                )  # [N2, rows*G]
                xs.append(stacked)
            if "nofwd8" not in ablate:
                xs = _fs_fwd8(xs, STW, pi, p)
            fwd_pi = [[None] * N1 for _ in range(rows_tot)]
            fwd_full = [None] * N1  # unsliced [N2, rows_tot*G] per tile
            for t in range(N1):
                if "nofmm" in ablate:  # probe: fwd 128-matmul cost
                    f = _to_bal_f32(xs[t], p)
                else:
                    f = _lane128_matmul_fwd_bal(
                        xs[t], w2f_ref[pi, t, 0], w2f_ref[pi, t, 1], p, ip
                    )
                fwd_full[t] = f
                for r in range(rows_tot):
                    fwd_pi[r][t] = f[:, r * G : (r + 1) * G]

            conv_pi = [[None] * N1 for _ in range(kp1)]
            stacked_pre = [None] * N1
            if tsptw:
                # ---- HYBRID: fs transforms, ts-oriented pointwise ----
                # The fs lane-splat BSK loads are 53% of kernel time while
                # the ts row-broadcast pointwise is near-free — but ts's
                # transform stages are ~3.5x slower (measured 2026-08-20:
                # fs-noptw 47 ms vs ts-noptw 166 ms per 1024 rot). Here the
                # fwd rows are TRANSPOSED into the ts packed layout (tile
                # pairs (tp, tp+4) in lane halves), the pointwise + subset
                # stage runs exactly as in ops/ts_pbs (same accumulation
                # order and reduction points -> bit-identical), and the
                # result transposes back for the fs inverse matmul.
                # bsk_ref here is the TS layout (mxu_server_key_ts).
                TPh = N1 // 2
                Lh = 2 * N2

                def ohmm_ts(ohT, tref):
                    # contract dim 0 of both: [K, G] x [K, M] -> [G, M]
                    return jax.lax.dot_general(
                        ohT, tref, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                # fwd rows to ts orientation: ONE transpose per (pi, tp)
                # of the sublane-stacked tile pair — the transposed lane
                # halves ARE the ts packed layout, no lane concat needed
                fwd_ts = [[None] * TPh for _ in range(rows_tot)]
                for tp in range(TPh):
                    pair = jnp.transpose(
                        jnp.concatenate(
                            [fwd_full[tp], fwd_full[tp + TPh]], axis=0
                        )
                    )  # [rows*G, Lh]
                    for r in range(rows_tot):
                        fwd_ts[r][tp] = pair[r * G : (r + 1) * G, :]
                # monomials + subset polys in ts orientation (tlo_ref /
                # thi_ref hold the TS tables when tsptw)
                Mall = []  # [i] -> [G, N1*N2] balanced f32
                for i in range(g):
                    oh_lo, oh_hi = ohs[i]
                    l0 = ohmm_ts(oh_lo, tlo_ref[pi, 0])
                    l1 = ohmm_ts(oh_lo, tlo_ref[pi, 1])
                    hv = ohmm_ts(oh_hi, thi_ref[pi, 0]) + 256.0 * ohmm_ts(
                        oh_hi, thi_ref[pi, 1]
                    )
                    Mall.append(
                        _redfbt(
                            l0 * hv + 256.0 * _redfbt(l1 * hv, p, ip),
                            p, ip,
                        )
                    )
                pva = {}
                for v in range(1, nv):
                    idxs = [i for i in range(g) if (v >> i) & 1]
                    cur = Mall[idxs[0]] - 1.0
                    for i in idxs[1:]:
                        cur = _fgmul(cur, Mall[i] - 1.0, p, ip)
                    pva[v] = _split256(cur)

                conv_ts = [[None] * TPh for _ in range(kp1)]
                for tp in range(TPh):
                    sl = slice(tp * Lh, (tp + 1) * Lh)
                    pvt = {
                        v: (pva[v][0][:, sl], pva[v][1][:, sl])
                        for v in range(1, nv)
                    }
                    D = [[None, None, None] for _ in range(kp1)]
                    Nc = [[0, 0, 0] for _ in range(kp1)]
                    S = [
                        [[None, None] for _ in range(kp1)]
                        for _ in range(nv)
                    ]
                    # pointwise: each BSK operand is a [1, Lh] ROW
                    # broadcast across gate sublanes (native splat).
                    # "blimb": the BSK rows are host-precomputed 8-bit limb
                    # pairs (mxu_server_key_hb2) and the fwd rows are used
                    # UNSPLIT — S = (sum fwd*b_lo) + 256*(sum fwd*b_hi)
                    # decomposes identically to the fwd-split form, with
                    # the same |.| <= (p/2)*128 chunk bound, so the final
                    # outputs stay bit-identical while every runtime
                    # _split256 in this stage disappears.
                    blimb = "blimb" in ablate
                    RSk = (nv - 1) * kp1 * NP * TPh * rows_tot
                    if not blimb:
                        splits = [
                            _split256(fwd_ts[r][tp])
                            for r in range(rows_tot)
                        ]

                    def brow(row):
                        if "implrow" in ablate:
                            # leave the [1, Lh] row implicit: Mosaic
                            # splats it once into a vreg at the consuming
                            # fma instead of materializing a [G, Lh] value
                            return bsk_ref[0][row : row + 1, :]
                        return jnp.broadcast_to(
                            bsk_ref[0][row : row + 1, :], (G, Lh)
                        )

                    for v in range(1, nv):
                        for c2 in range(kp1):
                            base = (
                                (((v - 1) * kp1 + c2) * NP + pi) * TPh + tp
                            ) * rows_tot
                            slo = shi = None
                            cc = 0
                            for r in range(rows_tot):
                                if "nobsk" in ablate:  # probe: load cost
                                    flo, fhi = (
                                        (fwd_ts[r][tp], fwd_ts[r][tp])
                                        if blimb
                                        else splits[r]
                                    )
                                    plo = flo * jnp.float32(3.0 + r + v)
                                    phi = fhi * jnp.float32(5.0 + r + v)
                                elif blimb:
                                    f = fwd_ts[r][tp]
                                    plo = f * brow(base + r)
                                    phi = f * brow(RSk + base + r)
                                else:
                                    b = brow(base + r)
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
                                d1
                                + _redfb(
                                    256.0 * _redfbt(d2, p, ip), p, ip
                                ),
                                p, ip,
                            )
                        conv_ts[c2][tp] = _redfbt(
                            d0 + _redfb(256.0 * u, p, ip), p, ip
                        )
                # back to fs orientation: ONE transpose per (pi, tp) of
                # the kp1-stacked pair; its sublane halves are the two
                # tiles' inverse-matmul operands
                for tp in range(TPh):
                    st = jnp.transpose(
                        jnp.concatenate(
                            [conv_ts[c][tp] for c in range(kp1)], axis=0
                        )
                    )  # [Lh, kp1*G]
                    stacked_pre[tp] = st[:N2, :]
                    stacked_pre[tp + TPh] = st[N2:, :]
            if "noptw" not in ablate and not tsptw:
                # monomial NTTs for ALL tiles at once: the flat [N1*N2, .]
                # tables turn 8 skinny one-hot matmuls into one per limb
                Mall = []  # [i] -> [N1*N2, G] balanced f32
                for i in range(g):
                    if "noladder" in ablate:
                        Mall.append(
                            jnp.broadcast_to(
                                tlo_ref[pi, 0][:, 1:2].astype(jnp.float32)
                                + 256.0
                                * tlo_ref[pi, 1][:, 1:2].astype(jnp.float32),
                                (N1 * N2, G),
                            )
                        )
                        continue
                    oh_lo, oh_hi = ohs[i]
                    l0 = ohmm(tlo_ref[pi, 0], oh_lo)  # |.| <= 128
                    l1 = ohmm(tlo_ref[pi, 1], oh_lo)
                    hv = ohmm(thi_ref[pi, 0], oh_hi) + 256.0 * ohmm(
                        thi_ref[pi, 1], oh_hi
                    )  # the selected value itself: |hv| <= p//2
                    Mall.append(
                        _redfbt(
                            l0 * hv + 256.0 * _redfbt(l1 * hv, p, ip),
                            p, ip,
                        )
                    )
                # subset polys P_v = prod_{i in v} (M_i - 1), batched over
                # tiles, stored as 8-bit limb pairs
                pva = {}
                for v in range(1, nv):
                    idxs = [i for i in range(g) if (v >> i) & 1]
                    cur = Mall[idxs[0]] - 1.0
                    for i in idxs[1:]:
                        cur = _fgmul(cur, Mall[i] - 1.0, p, ip)
                    pva[v] = _split256(cur)
            for t in range(0 if ("noptw" in ablate or tsptw) else N1):
                pvt = {
                    v: (
                        pva[v][0][t * N2 : (t + 1) * N2],
                        pva[v][1][t * N2 : (t + 1) * N2],
                    )
                    for v in range(1, nv)
                }

                # pointwise, r outer: each fwd row limb-split ONCE for
                # all nv*kp1 terms
                D = [[None, None, None] for _ in range(kp1)]
                Nc = [[0, 0, 0] for _ in range(kp1)]
                S = [
                    [[None, None] for _ in range(kp1)] for _ in range(nv)
                ]

                def _combine(v, c2, s0, s1):
                    # subset combination for ONE (v, c2):
                    # D[c2] += P_v (.) T_v, with T_v as reduced base-256
                    # digit pairs accumulated into three unreduced digit
                    # lanes D0 + 256*D1 + 2^16*D2 (the identity term is
                    # added post-CRT, not here)
                    if "nored" in ablate:  # probe: Barrett cost
                        tlo, thi = s0, s1
                    else:
                        tlo = _redfbt(s0, p, ip)
                        thi = _redfbt(s1, p, ip)
                    d, nn = D[c2], Nc[c2]
                    if "nogmul" in ablate:  # probe: subset cost
                        if d[0] is None:
                            d[0], d[1] = tlo, thi
                        else:
                            d[0] = d[0] + tlo
                            d[1] = d[1] + thi
                        return
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
                        d[0] = p0l * tlo
                        d[1] = p1l * tlo + p0l * thi
                    else:
                        d[0] = d[0] + p0l * tlo
                        d[1] = d[1] + p1l * tlo + p0l * thi
                    d[2] = (
                        p1l * thi
                        if d[2] is None
                        else d[2] + p1l * thi
                    )
                    nn[0] += 1
                    nn[1] += 2
                    nn[2] += 1

                # "fold": consume each T_v = (slo, shi) into D[c2]
                # IMMEDIATELY after its r-sum instead of storing all
                # nv*kp1 S pairs until a separate subset loop — the same
                # FP ops with identical operand association and D update
                # order (bit-identical), but the program's live set drops
                # by ~2*(nv-1)*kp1 [N2, G] arrays (the round-4 reproducer
                # pinned the pointwise deficit on live-set register
                # spills, PERFORMANCE.md:157-190).
                fold = (
                    ("fold" in ablate
                     or os.environ.get("HELM_TPU_FS_FOLD", "0") == "1")
                    and "nofold" not in ablate
                    and "nobsk" not in ablate
                    and "mxuexp" not in ablate
                )
                if "nobsk" not in ablate and "mxuexp" not in ablate:
                    # Broadcast path (DEFAULT): one [N2,1] column lane-splat
                    # per (v, c2, r). The `nobsk` probe scores the loads at
                    # 53% of kernel time at k=3, but that share is operand
                    # FETCH, not broadcast production: the MXU-expansion
                    # variant below (`mxuexp`) pays the same materialized
                    # operand traffic plus matmul dispatch and measured 23%
                    # SLOWER (2070.6 vs 2695.1 rot/s, k=3 gt=512 on-chip
                    # A/B 2026-08-19) — kept as the recorded negative
                    # result.
                    splits = [
                        _split256(fwd_pi[r][t]) for r in range(rows_tot)
                    ]
                    # fs16 variant: the BSK slab is balanced int16
                    # (|B| <= p//2 < 2^15, exact) — the lane splat
                    # materializes 2 bytes/element instead of 4, at the
                    # cost of one i16->f32 convert per term (the values
                    # are identical, so outputs stay bit-exact)
                    bsk_i16 = bsk_ref.dtype == jnp.int16
                    # "halfg": emit the r-sum per lane HALF-tile (disjoint
                    # [N2, G/2] slices processed sequentially) — identical
                    # elementwise ops and reduction points (bit-exact),
                    # half the per-value vreg footprint in the hot loop.
                    # Probes whether the pointwise deficit is per-value
                    # register pressure.
                    halves = (
                        [slice(0, G // 2), slice(G // 2, G)]
                        if ("halfg" in ablate and G % 2 == 0)
                        else [slice(0, G)]
                    )
                    for v in range(1, nv):
                        for c2 in range(kp1):
                            base = (
                                (((v - 1) * kp1 + c2) * NP + pi) * N1 + t
                            ) * rows_tot
                            chk = bsk_ref[0][:, base : base + rows_tot]
                            parts = []
                            for hs in halves:
                                hw = hs.stop - hs.start
                                slo = shi = None
                                cc = 0
                                for r in range(rows_tot):
                                    b = jnp.broadcast_to(
                                        chk[:, r : r + 1], (N2, hw)
                                    )
                                    if bsk_i16:
                                        b = b.astype(jnp.float32)
                                    if len(halves) == 1:
                                        flo, fhi = splits[r]
                                    else:
                                        flo = splits[r][0][:, hs]
                                        fhi = splits[r][1][:, hs]
                                    plo = flo * b
                                    phi = fhi * b
                                    slo = plo if slo is None else slo + plo
                                    shi = phi if shi is None else shi + phi
                                    cc += 1
                                    if cc == chunk and r + 1 < rows_tot:
                                        slo = _redfbt(slo, p, ip)
                                        shi = _redfbt(shi, p, ip)
                                        cc = 1
                                parts.append((slo, shi))
                            if len(parts) == 1:
                                slo, shi = parts[0]
                            else:
                                slo = jnp.concatenate(
                                    [q[0] for q in parts], axis=1
                                )
                                shi = jnp.concatenate(
                                    [q[1] for q in parts], axis=1
                                )
                            if fold:
                                _combine(v, c2, slo, shi)
                            else:
                                S[v][c2][0], S[v][c2][1] = slo, shi
                elif "nobsk" not in ablate:
                    # `mxuexp` probe: ONE exact matmul per (v, c2) replaces
                    # rows_tot lane-splat broadcasts. The [N2, rows] slab is
                    # limb-split in-registers (|b0|,|b1| <= 128, bf16-exact)
                    # and multiplied by the iota-built {0,1,256} expansion
                    # matrix: out[f, r*G+g] = b0[f,r] + 256*b1[f,r] =
                    # b[f,r], exact under the single-bf16-pass dot. Bit-
                    # identical to the default path (same accumulation
                    # order / chunk points) but measured 23% slower on-chip
                    # — see the note above.
                    flo_all, fhi_all = _split256(fwd_full[t])
                    for v in range(1, nv):
                        for c2 in range(kp1):
                            base = (
                                (((v - 1) * kp1 + c2) * NP + pi) * N1 + t
                            ) * rows_tot
                            chk = bsk_ref[0][:, base : base + rows_tot]
                            b1c = jnp.floor(chk * (1.0 / 256.0) + 0.5)
                            b0c = chk - 256.0 * b1c
                            b01 = jnp.concatenate([b0c, b1c], axis=1)
                            bexp = jax.lax.dot_general(
                                b01, e_rg,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # [N2, rows_tot*G] == b replicated per block
                            slo = shi = None
                            cc = 0
                            for r in range(rows_tot):
                                sl = slice(r * G, (r + 1) * G)
                                b = bexp[:, sl]
                                plo = flo_all[:, sl] * b
                                phi = fhi_all[:, sl] * b
                                slo = plo if slo is None else slo + plo
                                shi = phi if shi is None else shi + phi
                                cc += 1
                                if cc == chunk and r + 1 < rows_tot:
                                    slo = _redfbt(slo, p, ip)
                                    shi = _redfbt(shi, p, ip)
                                    cc = 1
                            S[v][c2][0], S[v][c2][1] = slo, shi
                cnt = 0
                for r in range(rows_tot if "nobsk" in ablate else 0):
                    flo, fhi = _split256(fwd_pi[r][t])
                    # v=0 (GGSW of 1) is never keyed: the identity
                    # part of the CMux is ADDED after the CRT stage
                    # instead - 25% fewer pointwise terms / BSK loads
                    for v in range(1, nv):
                        for c2 in range(kp1):
                            cidx = (
                                (((v - 1) * rows_tot + r) * kp1 + c2) * NP
                                + pi
                            ) * N1 + t
                            if "nobsk" in ablate:  # probe: load cost
                                plo = flo * jnp.float32(3.0 + r)
                                phi = fhi * jnp.float32(5.0 + r)
                            else:
                                b = col(bsk_ref[0], cidx)
                                plo = flo * b
                                phi = fhi * b
                            if S[v][c2][0] is None:
                                S[v][c2][0], S[v][c2][1] = plo, phi
                            else:
                                S[v][c2][0] = S[v][c2][0] + plo
                                S[v][c2][1] = S[v][c2][1] + phi
                    cnt += 1
                    if cnt == chunk and r + 1 < rows_tot:
                        for v in range(1, nv):
                            for c2 in range(kp1):
                                S[v][c2][0] = _redfbt(S[v][c2][0], p, ip)
                                S[v][c2][1] = _redfbt(S[v][c2][1], p, ip)
                        cnt = 1
                # subset combination (non-fold paths only — nobsk /
                # mxuexp probes, or fold disabled): consume the stored
                # S pairs in the same (v, c2) order as the fold path
                if not fold:
                    for v in range(1, nv):
                        for c2 in range(kp1):
                            _combine(v, c2, S[v][c2][0], S[v][c2][1])
                # fold D0 + 256*(D1 + 256*D2) mod p -> balanced <= p//2
                # (the inverse matmul's 256-limbs must stay <= 128 for
                # bf16-exactness on the MXU's single f32 pass)
                for c2 in range(kp1):
                    d0, d1, d2 = D[c2]
                    if d2 is None:
                        u = _redfbt(d1, p, ip)
                    else:
                        u = _redfbt(
                            d1 + _redfb(256.0 * _redfbt(d2, p, ip), p, ip),
                            p, ip,
                        )
                    conv_pi[c2][t] = _redfbt(
                        d0 + _redfb(256.0 * u, p, ip), p, ip
                    )
            if "noptw" in ablate:
                conv_pi = [list(fwd_pi[0]) for _ in range(kp1)]

            # inverse NTT for this prime (kp1 polys along lanes)
            xs2 = []
            for t in range(N1):
                stacked = (
                    stacked_pre[t]
                    if tsptw
                    else jnp.concatenate(
                        [conv_pi[c][t] for c in range(kp1)], axis=1
                    )
                )  # [N2, kp1*G] balanced f32
                if "noimm" in ablate:  # probe: inverse 128-matmul cost
                    i32 = stacked.astype(jnp.int32)
                    xs2.append(
                        jnp.where(i32 < 0, i32 + p, i32).astype(jnp.uint32)
                    )
                else:
                    xs2.append(
                        _lane128_matmul_inv_bal(
                            stacked, w2fi_ref[pi, t, 0], w2fi_ref[pi, t, 1],
                            p, ip,
                        )
                    )
            xs3 = xs2 if "noinv8" in ablate else _fs_inv8(xs2, ISTW, pi, p)
            if "crtacc" in ablate:
                for c in range(kp1):
                    for t in range(N1):
                        r = xs3[t][:, c * G : (c + 1) * G]
                        if "nocrt" in ablate:
                            ti, tf = r, None
                        else:
                            ti = r * jnp.uint32(CRT_W_MOD[pi])
                            tf = (
                                r.astype(jnp.int32).astype(jnp.float32)
                                * CRT_FRAC[pi]
                            )
                        if pi == 0:
                            crt_i[c][t], crt_f[c][t] = ti, tf
                        else:
                            crt_i[c][t] = crt_i[c][t] + ti
                            if tf is not None:
                                crt_f[c][t] = crt_f[c][t] + tf
            else:
                inv_res.append(xs3)

        # --- CRT recombination across primes
        for c in range(kp1):
            for t in range(N1):
                if "crtacc" in ablate:
                    if "nocrt" in ablate:
                        acc_scr[c, t] = acc_scr[c, t] + crt_i[c][t]
                    else:
                        kq = (
                            jnp.floor(crt_f[c][t] + 0.5)
                            .astype(jnp.int32)
                            .astype(jnp.uint32)
                        )
                        acc_scr[c, t] = acc_scr[c, t] + (
                            crt_i[c][t] - kq * jnp.uint32(PROD_MOD)
                        )
                    continue
                res = [
                    inv_res[pi][t][:, c * G : (c + 1) * G]
                    for pi in range(NP)
                ]
                if "nocrt" in ablate:  # probe: CRT recombination cost
                    acc_scr[c, t] = (
                        acc_scr[c, t] + res[0] + res[1] + res[2] + res[3]
                    )
                else:
                    # additive-identity CMux: the v=0 GGSW-of-1 product
                    # is exactly acc, so ADD the external product here
                    acc_scr[c, t] = acc_scr[c, t] + _crt_fast(
                        res, CRT_W_MOD, CRT_FRAC, PROD_MOD
                    )

        @pl.when(j == n // g - 1)
        def _():
            out_ref[0] = acc_scr[...]

    return kernel


@functools.lru_cache(maxsize=None)
def _mxu_key_cache():
    return {}


def _layout_cache(tag: str, src, build):
    """Process-global BSK-layout memo, safe against id() reuse.

    Entries are keyed by (tag, id(src)) but each holds a weakref to the
    source array and is only served while `ref() is src` — after the
    source is collected, CPython may hand its id to a DIFFERENT server
    key's array, and an unguarded id key would silently return the
    previous key's layout (wrong ciphertexts on key rotation within one
    process). A weakref callback evicts dead entries; objects that
    cannot be weak-referenced are kept alive by the fallback closure so
    their id cannot be reused."""
    cache = _mxu_key_cache()
    key = (tag, id(src))
    ent = cache.get(key)
    if ent is not None and ent[0]() is src:
        return ent[1]
    val = build()
    import weakref

    try:
        ref = weakref.ref(src, lambda _r, _k=key: cache.pop(_k, None))
    except TypeError:  # not weakref-able: retain (id stays unique)
        ref = lambda _s=src: _s  # noqa: E731
    cache[key] = (ref, val)
    return val


def mxu_server_key(dsk):
    """BSK permuted into MXU order and laid out [.., N2(fB), 8(fA)]."""

    def build():
        t = mxu_ntt.mxu_tables(dsk.params.N)
        perm = jnp.asarray(t["perm_from_std"])
        N = dsk.bsk_ntt.shape[-1]
        N2 = N // N1

        @jax.jit
        def conv(b):
            # [.., N] --perm--> mxu flat (fA*N2 + fB) -> [.., fA, fB] -> [.., fB, fA]
            # (leading dims: [n, rows, kp1, NP] single-bit or
            #  [n/g, 2^g, rows, kp1, NP] multi-bit)
            x = b[..., perm].reshape(*b.shape[:-1], N1, N2)
            return jnp.swapaxes(x, -2, -1)

        return (conv(dsk.bsk_ntt), conv(dsk.bsk_ntt_sh))

    return _layout_cache("gm", dsk.bsk_ntt, build)


@functools.partial(jax.jit, static_argnames=("params", "g_tile", "interpret"))
def blind_rotate_mxu(
    params: TfheParams,
    bsk_mxu,
    bsk_mxu_sh,
    lwe_in,
    testv,
    g_tile: int = 32,
    interpret: bool = False,
):
    from ..fhe import ops as fops

    N, k, n = params.N, params.k, params.n
    N2 = N // N1
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
    tiles = Gp // g_tile
    L = N1 * g_tile

    t = mxu_ntt.mxu_tables(N)
    abar = fops.mod_switch(jnp, lwe_in[:, :n], N).astype(jnp.int32)
    bbar = fops.mod_switch(jnp, lwe_in[:, n], N)
    neg_b = (jnp.uint32(2 * N) - bbar) & jnp.uint32(2 * N - 1)
    body = fops.negacyclic_rotate(jnp, jnp.broadcast_to(testv, (Gp, N)), neg_b, N)
    # [Gp, N] -> [tiles, kp1, N2(jB), L(g, jA)] (g-major lanes)
    body = body.reshape(tiles, g_tile, N1, N2)
    body = jnp.transpose(body, (0, 3, 1, 2)).reshape(tiles, 1, N2, L)
    acc0 = jnp.concatenate(
        [jnp.zeros((tiles, k, N2, L), jnp.uint32), body], axis=1
    )
    # amounts pre-expanded x8 so each gate's block of lanes shares its value
    abar_e = jnp.repeat(
        abar.reshape(tiles, g_tile, n), N1, axis=1
    ).transpose(0, 2, 1)  # [tiles, n, L]

    # transposed twist/W2 tables for this layout
    tw_t = jnp.transpose(jnp.asarray(t["tw"]), (0, 2, 1))  # [NP, N2, 8]
    tw_sh_t = jnp.transpose(jnp.asarray(t["tw_sh"]), (0, 2, 1))
    twi_t = jnp.transpose(jnp.asarray(t["twi"]), (0, 2, 1))
    twi_sh_t = jnp.transpose(jnp.asarray(t["twi_sh"]), (0, 2, 1))
    w2t = jnp.transpose(
        jnp.asarray(t["w2_limbs"], dtype=jnp.float32), (0, 1, 3, 2)
    )
    w2ti = jnp.transpose(
        jnp.asarray(t["w2i_limbs"], dtype=jnp.float32), (0, 1, 3, 2)
    )
    # lane-expansion matrix: e8[jA, g*8 + jA] = 1, tiled to the widest use
    wide = max(rows * L, kp1 * L)
    e8 = np.zeros((N1, wide), np.float32)
    lanes = np.arange(wide)
    e8[lanes % N1, lanes] = 1.0
    e8 = jnp.asarray(e8)

    kernel = _make_kernel(params, g_tile)

    def cmap(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda i, j, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        kernel,
        grid=(tiles, n),
        in_specs=[
            pl.BlockSpec(
                (1, kp1, N2, L), lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, n, L), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            cmap((NP, LOG_N1, N1)),
            cmap((NP, LOG_N1, N1)),
            cmap((NP, LOG_N1, N1)),
            cmap((NP, LOG_N1, N1)),
            cmap((NP, N2, N1)),
            cmap((NP, N2, N1)),
            cmap((NP, N2, N1)),
            cmap((NP, N2, N1)),
            cmap((NP, 2, N2, N2)),
            cmap((NP, 2, N2, N2)),
            cmap((N1, max(rows * L, kp1 * L))),
            pl.BlockSpec(
                (1, rows, kp1, NP, N2, N1), lambda i, j: (j, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows, kp1, NP, N2, N1), lambda i, j: (j, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, kp1, N2, L), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((tiles, kp1, N2, L), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((kp1, N2, L), jnp.uint32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        acc0,
        abar_e,
        jnp.asarray(t["stage_tw"]),
        jnp.asarray(t["stage_tw_sh"]),
        jnp.asarray(t["istage_tw"]),
        jnp.asarray(t["istage_tw_sh"]),
        tw_t,
        tw_sh_t,
        twi_t,
        twi_sh_t,
        w2t,
        w2ti,
        e8,
        bsk_mxu,
        bsk_mxu_sh,
    )
    # [tiles, kp1, N2, L(g, jA)] -> [Gp, kp1, N]
    acc = out.reshape(tiles, kp1, N2, g_tile, N1)
    acc = jnp.transpose(acc, (0, 3, 1, 4, 2)).reshape(Gp, kp1, N)
    return acc[:G]


@functools.lru_cache(maxsize=None)
def _mono_tables_mxu(N: int, g_tile: int):
    """Monomial ladder tables in kernel layout: u32 [NP, L2N, N2, L],
    lane-expanded (value depends only on fA = lane % 8) so the kernel does
    no expansion work. ~[4, 11, 128, 256] u32 = 5.8 MB per table at N=1024."""
    from ..fhe.pbs_jnp import monomial_tables

    t = mxu_ntt.mxu_tables(N)
    perm = np.asarray(t["perm_from_std"])
    mono, mono_sh = monomial_tables(N)  # [L2N, NP, N] standard NTT order

    def mx(m):
        x = m[:, :, perm].reshape(m.shape[0], m.shape[1], N1, N // N1)
        x = np.transpose(x, (1, 0, 3, 2))  # [NP, L2N, N2, N1]
        return np.tile(x, (1, 1, 1, g_tile))  # [NP, L2N, N2, L]

    # numpy on purpose: this function is called under jit tracing, where a
    # jnp.asarray would produce (and cache) a trace-local constant
    return mx(mono), mx(mono_sh)


@functools.partial(
    jax.jit, static_argnames=("params", "g_tile", "interpret", "ablate")
)
def blind_rotate_mxu_mb(
    params: TfheParams,
    bsk_mxu,
    bsk_mxu_sh,
    lwe_in,
    testv,
    g_tile: int = 32,
    interpret: bool = False,
    ablate: str = "",
):
    """Multi-bit MXU blind rotation: grid (tiles, n / grouping)."""
    from ..fhe import ops as fops

    N, k, n = params.N, params.k, params.n
    g = params.grouping
    nv = 1 << g
    groups = n // g
    N2 = N // N1
    kp1 = k + 1
    rows = params.gadget_rows
    NP = len(primes_for(N))
    L2N = N.bit_length()
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
    L = N1 * g_tile

    t = mxu_ntt.mxu_tables(N)
    abar = fops.mod_switch(jnp, lwe_in[:, :n], N).astype(jnp.int32)
    bbar = fops.mod_switch(jnp, lwe_in[:, n], N)
    neg_b = (jnp.uint32(2 * N) - bbar) & jnp.uint32(2 * N - 1)
    body = fops.negacyclic_rotate(jnp, jnp.broadcast_to(testv, (Gp, N)), neg_b, N)
    body = body.reshape(tiles, g_tile, N1, N2)
    body = jnp.transpose(body, (0, 3, 1, 2)).reshape(tiles, 1, N2, L)
    acc0 = jnp.concatenate(
        [jnp.zeros((tiles, k, N2, L), jnp.uint32), body], axis=1
    )
    abar_e = jnp.repeat(
        abar.reshape(tiles, g_tile, n), N1, axis=1
    ).transpose(0, 2, 1)  # [tiles, n, L]

    tw_t = jnp.transpose(jnp.asarray(t["tw"]), (0, 2, 1))
    tw_sh_t = jnp.transpose(jnp.asarray(t["tw_sh"]), (0, 2, 1))
    twi_t = jnp.transpose(jnp.asarray(t["twi"]), (0, 2, 1))
    twi_sh_t = jnp.transpose(jnp.asarray(t["twi_sh"]), (0, 2, 1))
    w2t = jnp.transpose(
        jnp.asarray(t["w2_limbs"], dtype=jnp.float32), (0, 1, 3, 2)
    )
    w2ti = jnp.transpose(
        jnp.asarray(t["w2i_limbs"], dtype=jnp.float32), (0, 1, 3, 2)
    )
    wide = max(rows * L, kp1 * L)
    e8 = np.zeros((N1, wide), np.float32)
    lanes = np.arange(wide)
    e8[lanes % N1, lanes] = 1.0
    e8 = jnp.asarray(e8)
    mono_e, mono_sh_e = _mono_tables_mxu(N, g_tile)

    kernel = _make_kernel_mb(params, g_tile, frozenset(ablate.split(",")) - {""})

    def cmap(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda i, j, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        kernel,
        grid=(tiles, groups),
        in_specs=[
            pl.BlockSpec(
                (1, kp1, N2, L), lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, n, L), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            cmap((NP, LOG_N1, N1)),
            cmap((NP, LOG_N1, N1)),
            cmap((NP, LOG_N1, N1)),
            cmap((NP, LOG_N1, N1)),
            cmap((NP, N2, N1)),
            cmap((NP, N2, N1)),
            cmap((NP, N2, N1)),
            cmap((NP, N2, N1)),
            cmap((NP, 2, N2, N2)),
            cmap((NP, 2, N2, N2)),
            cmap((N1, wide)),
            cmap((NP, L2N, N2, L)),
            cmap((NP, L2N, N2, L)),
            pl.BlockSpec(
                (1, nv - 1, rows, kp1, NP, N2, N1),
                lambda i, j: (j, 0, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nv - 1, rows, kp1, NP, N2, N1),
                lambda i, j: (j, 0, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, kp1, N2, L), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((tiles, kp1, N2, L), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((kp1, N2, L), jnp.uint32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(
        acc0,
        abar_e,
        jnp.asarray(t["stage_tw"]),
        jnp.asarray(t["stage_tw_sh"]),
        jnp.asarray(t["istage_tw"]),
        jnp.asarray(t["istage_tw_sh"]),
        tw_t,
        tw_sh_t,
        twi_t,
        twi_sh_t,
        w2t,
        w2ti,
        e8,
        mono_e,
        mono_sh_e,
        bsk_mxu,
        bsk_mxu_sh,
    )
    acc = out.reshape(tiles, kp1, N2, g_tile, N1)
    acc = jnp.transpose(acc, (0, 3, 1, 4, 2)).reshape(Gp, kp1, N)
    return acc[:G]


def mxu_server_key_fs(dsk):
    """Grouped BSK in frequency-in-sublanes layout, as ONE balanced-signed
    f32 value per entry (|B| <= p//2 < 2^16, exactly representable):
    [groups, N2, (nv-1)*rows*kp1*NP*N1], col =
    (((((v-1)*kp1+c2)*NP+pi)*N1+fA)*rows + r
    (v >= 1: the empty subset is handled additively in the kernel).
    The kernel splits the *NTT outputs* into 8-bit limbs instead (once per
    decomposition row, reused across all nv*kp1 terms), so each pointwise
    term costs ONE column broadcast of this slab rather than a lo/hi pair —
    and the slab's VMEM/HBM footprint halves."""

    def build():
        t = mxu_ntt.mxu_tables(dsk.params.N)
        perm = jnp.asarray(t["perm_from_std"])
        groups, nv, rows, kp1, NP, N = dsk.bsk_ntt.shape
        N2 = N // N1
        pr = jnp.asarray(
            np.array(primes_for(dsk.params.N), np.int32)
        ).reshape(1, 1, 1, 1, NP, 1)

        @jax.jit
        def make(b_u32):
            b = b_u32.astype(jnp.int32)
            bal = jnp.where(b > pr // 2, b - pr, b).astype(jnp.float32)
            x = bal[..., perm].reshape(groups, nv, rows, kp1, NP, N1, N2)
            # r-contiguous: col = ((((v*kp1+c2)*NP+pi)*N1+t)*rows + r:
            # one [N2, rows] slice feeds a (v, c2) term group in the
            # kernel, so lane extracts come from registers instead of
            # per-term strided VMEM column reads (+3.6% measured at k=3)
            x = jnp.transpose(x, (0, 6, 1, 3, 4, 5, 2))
            return x.reshape(groups, N2, nv * rows * kp1 * NP * N1)

        return make(dsk.bsk_ntt)

    return _layout_cache("fs-rc", dsk.bsk_ntt, build)


def mxu_server_key_fs_i16(dsk):
    """fs layout with the BSK slab stored as balanced int16.

    Identical column order/values to mxu_server_key_fs; balanced entries
    satisfy |B| <= p//2 < 2^15 (all CRT primes are < 2^16) so int16 is
    exact. Halves the slab's HBM/VMEM footprint AND the per-term lane-splat
    bytes in the pointwise stage — the round-4 A/B for the measured
    splat-materialization bound (PERFORMANCE.md round 3): traffic halves
    but each term pays an i16->f32 convert. Select with
    HELM_TPU_MB_KERNEL=fs16."""

    def build():
        fs = mxu_server_key_fs(dsk)

        @jax.jit
        def conv(x):
            return x.astype(jnp.int16)

        return conv(fs)

    return _layout_cache("fs-i16", dsk.bsk_ntt, build)


def mxu_server_key_ps(dsk):
    """fs slab re-laid for the prime-split kernel: prime OUTERMOST so the
    grid's pi axis can DMA one prime's block per step,
    [groups, NP, N2, (nv-1)*kp1*N1*rows], col =
    ((v-1)*kp1+c2)*N1*rows + t*rows + r. Values identical to
    mxu_server_key_fs (a pure permutation)."""

    def build():
        fs = mxu_server_key_fs(dsk)
        p = dsk.params
        nvm1 = (1 << p.grouping) - 1
        rows = p.gadget_rows
        kp1 = p.k + 1
        NP = len(primes_for(p.N))
        groups, N2, CC = fs.shape
        vc = nvm1 * kp1
        assert CC == vc * NP * N1 * rows

        @jax.jit
        def conv(x):
            y = x.reshape(groups, N2, vc, NP, N1 * rows)
            y = jnp.transpose(y, (0, 3, 1, 2, 4))
            return y.reshape(groups, NP, N2, vc * N1 * rows)

        return conv(fs)

    return _layout_cache("fs-ps", dsk.bsk_ntt, build)


# --- dynamic-scalar modular helpers for the prime-split kernel: identical
# arithmetic to the static versions above, with the prime supplied as
# runtime scalars (read from SMEM) instead of trace-time constants, so a
# single compiled body serves every CRT prime.


def _redfb_d(t, pf, ipf):
    q = jnp.floor(t * ipf + 0.5)
    return t - q * pf


def _tighten_d(t, pf, hpf):
    t = jnp.where(t > hpf, t - pf, t)
    return jnp.where(t < -hpf, t + pf, t)


def _redfbt_d(t, pf, hpf, ipf):
    return _tighten_d(_redfb_d(t, pf, ipf), pf, hpf)


def _to_bal_f32_d(u, p_i):
    t32 = u.astype(jnp.int32)
    hp = p_i // 2
    return jnp.where(t32 > hp, t32 - p_i, t32).astype(jnp.float32)


def _fgmul_d(a, b, pf, hpf, ipf):
    a0, a1 = _split256(a)
    return _redfbt_d(
        a0 * b + 256.0 * _redfbt_d(a1 * b, pf, hpf, ipf), pf, hpf, ipf
    )


def _mm128_bal_d(bal, w0, w1, pf, hpf, ipf):
    a0, a1 = _split256(bal)
    a0 = a0.astype(jnp.bfloat16)
    a1 = a1.astype(jnp.bfloat16)

    def mm(w, a):
        return jax.lax.dot_general(
            w, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    m00 = mm(w0, a0)
    mid = mm(w1, a0) + mm(w0, a1)
    m11 = mm(w1, a1)
    hi = _redfbt_d(m11, pf, hpf, ipf)
    u = _redfb_d(mid, pf, ipf)
    s1 = _redfbt_d(u + 256.0 * hi, pf, hpf, ipf)
    return _redfbt_d(m00 + 256.0 * s1, pf, hpf, ipf)


def _fs_fwd8_d(xs, stw_ref, pi_id, p_u):
    for s in range(LOG_N1):
        t = N1 >> (s + 1)
        ys = [None] * N1
        for i0 in range(0, N1, 2 * t):
            for i in range(i0, i0 + t):
                w = stw_ref[pi_id, 0, s, i]
                wsh = stw_ref[pi_id, 1, s, i]
                t1 = _mshoup(xs[i + t], w, wsh, p_u)
                ys[i] = _madd(xs[i], t1, p_u)
                ys[i + t] = _msub(xs[i], t1, p_u)
        xs = ys
    return xs


def _fs_inv8_d(xs, istw_ref, pi_id, p_u):
    for s in range(LOG_N1):
        t = 1 << s
        ys = [None] * N1
        for i0 in range(0, N1, 2 * t):
            for i in range(i0, i0 + t):
                w = istw_ref[pi_id, 0, s, i]
                wsh = istw_ref[pi_id, 1, s, i]
                ys[i] = _madd(xs[i], xs[i + t], p_u)
                ys[i + t] = _mshoup(
                    _msub(xs[i], xs[i + t], p_u), w, wsh, p_u
                )
        xs = ys
    return xs


def _make_kernel_fs_ps(params: TfheParams, g_tile: int):
    """Prime-split fs kernel: the CRT-prime loop moves onto the GRID
    (grid = (tiles, groups, NP)), so each grid step runs ONE prime's
    transforms + pointwise — a ~4x smaller program for Mosaic to
    schedule. Motivation (round-5 probe matrix, PERFORMANCE.md): every
    isolated pointwise structure (splats, live set, reductions,
    two-array operands) runs at 0.75-1.15 T fma-elems/s while the full
    kernel's pointwise achieves ~0.45 — the deficit is emergent in the
    big multi-stage program, so shrink the program per step.

    Bit-identical to the fs kernel with ablate='crtacc' semantics: the
    per-prime inverse-NTT residues fold into running CRT partial sums
    (same addition order); gadget digits are computed once per j at
    pi == 0 and staged in VMEM scratch; per-prime constants arrive as
    SMEM scalars / per-prime table blocks. The subset-combination
    reduction points use the MINIMUM dchunk across primes (extra
    tightened Barrett reductions are value-preserving: _redfbt maps any
    congruent in-range representative to the unique balanced one)."""
    N, k, n = params.N, params.k, params.n
    g = params.grouping
    nv = 1 << g
    N2 = N // N1
    kp1 = k + 1
    gadgets = params.component_gadgets
    rows_tot = params.gadget_rows
    tab = get_tables(N)
    PRIMES = tuple(int(p) for p in tab.primes)
    NP = len(PRIMES)
    PROD = 1
    for _p in PRIMES:
        PROD *= _p
    PROD_MOD = PROD % (1 << 32)
    G = g_tile
    # common (minimum) reduction thresholds across primes — see docstring
    chunk_min = min((1 << 24) // ((p // 2 + 1) * 128) for p in PRIMES)
    dchunk_min = min(
        ((1 << 24) - p // 2 - 2 * p) // ((p // 2 + 1) * 128)
        for p in PRIMES
    )
    if chunk_min <= rows_tot:
        raise NotImplementedError(
            "fs-ps assumes no mid-r-sum reductions (chunk > rows)"
        )
    for bl, _lv in gadgets:
        if (1 << (bl - 1)) >= min(PRIMES):
            raise NotImplementedError(
                "fs-ps digit residues need 2^(bl-1) < min prime"
            )
    row_bl = [bl for bl, lv in gadgets for _ in range(lv)]
    row0 = []
    acc_c = 0
    for bl, lv in gadgets:
        row0.append(acc_c)
        acc_c += lv
    LOW = min(64, 2 * N)
    HBW = max(1, (2 * N) // LOW)

    def kernel(
        acc0_ref,   # (1, kp1, N1, N2, G) u32       [i]
        abar_ref,   # (1, n, G) i32                 [i]
        w2f_ref,    # (1, N1, 2, N2, N2) bf16       [pi]
        w2fi_ref,   # (1, N1, 2, N2, N2) bf16       [pi]
        tlo_ref,    # (1, 2, N1*N2, LOW) bf16       [pi]
        thi_ref,    # (1, 2, N1*N2, HBW) bf16       [pi]
        stw_ref,    # (NP, 2, LOG_N1, N1) u32 SMEM, full array
        istw_ref,   # (NP, 2, LOG_N1, N1) u32 SMEM, full array
        si_ref,     # (NP, 2) u32 SMEM: p, crt_w_mod (full array)
        sf_ref,     # (NP, 4) f32 SMEM: 1/p, frac, p, p//2 (full array)
        bsk_ref,    # (1, 1, N2, vc*N1*rows) f32    [j, pi]
        out_ref,    # (1, kp1, N1, N2, G) u32       [i]
        acc_scr,    # (kp1, N1, N2, G) u32
        digs_scr,   # (rows, N1, N2, G) i32
        crt_i_scr,  # (kp1, N1, N2, G) u32
        crt_f_scr,  # (kp1, N1, N2, G) f32
    ):
        j = pl.program_id(1)
        pi_id = pl.program_id(2)

        @pl.when((j == 0) & (pi_id == 0))
        def _():
            acc_scr[...] = acc0_ref[0]

        p_u = si_ref[pi_id, 0]
        wmod = si_ref[pi_id, 1]
        ipf = sf_ref[pi_id, 0]
        frac = sf_ref[pi_id, 1]
        pf = sf_ref[pi_id, 2]
        hpf = sf_ref[pi_id, 3]
        p_i = p_u.astype(jnp.int32)

        # gadget digits: once per j (pi == 0), staged for the other primes
        @pl.when(pi_id == 0)
        def _():
            for c in range(kp1):
                bl_c, lv_c = gadgets[c]
                for t in range(N1):
                    ds = _decompose(acc_scr[c, t], bl_c, lv_c)
                    for l, d in enumerate(ds):
                        digs_scr[row0[c] + l, t] = d

        # per-gate one-hot monomial selectors (prime-independent values,
        # rebuilt per step — two iota compares, ~free)
        def ohmm(tref, oh):
            return jax.lax.dot_general(
                tref, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        ohs = []
        for i in range(g):
            a_i = abar_ref[0, g * j + i, :]
            alo = (a_i & (LOW - 1))[None, :]
            ahi = (a_i >> LOG2[LOW])[None, :]
            ohs.append((
                (
                    jax.lax.broadcasted_iota(jnp.int32, (LOW, G), 0)
                    == alo
                ).astype(jnp.bfloat16),
                (
                    jax.lax.broadcasted_iota(jnp.int32, (HBW, G), 0)
                    == ahi
                ).astype(jnp.bfloat16),
            ))

        # --- this prime's residues -> forward NTT
        xs = []
        for t in range(N1):
            stacked = jnp.concatenate(
                [
                    jnp.where(
                        digs_scr[r, t] < 0,
                        digs_scr[r, t] + p_i,
                        digs_scr[r, t],
                    ).astype(jnp.uint32)
                    for r in range(rows_tot)
                ],
                axis=1,
            )  # [N2, rows*G]
            xs.append(stacked)
        xs = _fs_fwd8_d(xs, stw_ref, pi_id, p_u)
        fwd_pi = [[None] * N1 for _ in range(rows_tot)]
        for t in range(N1):
            f = _mm128_bal_d(
                _to_bal_f32_d(xs[t], p_i),
                w2f_ref[0, t, 0], w2f_ref[0, t, 1], pf, hpf, ipf,
            )
            for r in range(rows_tot):
                fwd_pi[r][t] = f[:, r * G : (r + 1) * G]

        # --- monomial NTTs + subset polynomials for this prime
        Mall = []
        for i in range(g):
            oh_lo, oh_hi = ohs[i]
            l0 = ohmm(tlo_ref[0, 0], oh_lo)
            l1 = ohmm(tlo_ref[0, 1], oh_lo)
            hv = ohmm(thi_ref[0, 0], oh_hi) + 256.0 * ohmm(
                thi_ref[0, 1], oh_hi
            )
            Mall.append(
                _redfbt_d(
                    l0 * hv
                    + 256.0 * _redfbt_d(l1 * hv, pf, hpf, ipf),
                    pf, hpf, ipf,
                )
            )
        pva = {}
        for v in range(1, nv):
            idxs = [i for i in range(g) if (v >> i) & 1]
            cur = Mall[idxs[0]] - 1.0
            for i in idxs[1:]:
                cur = _fgmul_d(cur, Mall[i] - 1.0, pf, hpf, ipf)
            pva[v] = _split256(cur)

        # --- pointwise + subset combination per tile
        conv_pi = [[None] * N1 for _ in range(kp1)]
        for t in range(N1):
            pvt = {
                v: (
                    pva[v][0][t * N2 : (t + 1) * N2],
                    pva[v][1][t * N2 : (t + 1) * N2],
                )
                for v in range(1, nv)
            }
            splits = [_split256(fwd_pi[r][t]) for r in range(rows_tot)]
            D = [[None, None, None] for _ in range(kp1)]
            Nc = [[0, 0, 0] for _ in range(kp1)]
            S = [[[None, None] for _ in range(kp1)] for _ in range(nv)]
            for v in range(1, nv):
                for c2 in range(kp1):
                    base = (((v - 1) * kp1 + c2) * N1 + t) * rows_tot
                    chk = bsk_ref[0, 0][:, base : base + rows_tot]
                    slo = shi = None
                    for r in range(rows_tot):
                        b = jnp.broadcast_to(chk[:, r : r + 1], (N2, G))
                        flo, fhi = splits[r]
                        plo = flo * b
                        phi = fhi * b
                        slo = plo if slo is None else slo + plo
                        shi = phi if shi is None else shi + phi
                    S[v][c2][0], S[v][c2][1] = slo, shi
            for v in range(1, nv):
                for c2 in range(kp1):
                    tlo_ = _redfbt_d(S[v][c2][0], pf, hpf, ipf)
                    thi_ = _redfbt_d(S[v][c2][1], pf, hpf, ipf)
                    d, nn = D[c2], Nc[c2]
                    if d[1] is not None and nn[1] + 2 > dchunk_min:
                        d[1] = _redfbt_d(d[1], pf, hpf, ipf)
                        nn[1] = 0
                    if d[0] is not None and nn[0] + 1 > dchunk_min:
                        d[0] = _redfbt_d(d[0], pf, hpf, ipf)
                        nn[0] = 0
                    if d[2] is not None and nn[2] + 1 > dchunk_min:
                        d[2] = _redfbt_d(d[2], pf, hpf, ipf)
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
                    u = _redfbt_d(d1, pf, hpf, ipf)
                else:
                    u = _redfbt_d(
                        d1
                        + _redfb_d(
                            256.0 * _redfbt_d(d2, pf, hpf, ipf), pf, ipf
                        ),
                        pf, hpf, ipf,
                    )
                conv_pi[c2][t] = _redfbt_d(
                    d0 + _redfb_d(256.0 * u, pf, ipf), pf, hpf, ipf
                )

        # --- inverse NTT for this prime
        xs2 = []
        for t in range(N1):
            stacked = jnp.concatenate(
                [conv_pi[c][t] for c in range(kp1)], axis=1
            )
            ob = _mm128_bal_d(
                stacked, w2fi_ref[0, t, 0], w2fi_ref[0, t, 1],
                pf, hpf, ipf,
            )
            i32 = ob.astype(jnp.int32)
            xs2.append(
                jnp.where(i32 < 0, i32 + p_i, i32).astype(jnp.uint32)
            )
        xs3 = _fs_inv8_d(xs2, istw_ref, pi_id, p_u)

        # --- accumulate CRT partial sums (crtacc semantics/order)
        for c in range(kp1):
            for t in range(N1):
                r_ = xs3[t][:, c * G : (c + 1) * G]
                ti = r_ * wmod
                tf = r_.astype(jnp.int32).astype(jnp.float32) * frac
                first = pi_id == 0
                crt_i_scr[c, t] = jnp.where(
                    first, ti, crt_i_scr[c, t] + ti
                )
                crt_f_scr[c, t] = jnp.where(
                    first, tf, crt_f_scr[c, t] + tf
                )

        @pl.when(pi_id == NP - 1)
        def _():
            for c in range(kp1):
                for t in range(N1):
                    kq = (
                        jnp.floor(crt_f_scr[c, t] + 0.5)
                        .astype(jnp.int32)
                        .astype(jnp.uint32)
                    )
                    acc_scr[c, t] = acc_scr[c, t] + (
                        crt_i_scr[c, t] - kq * jnp.uint32(PROD_MOD)
                    )

        @pl.when((j == n // g - 1) & (pi_id == NP - 1))
        def _():
            out_ref[0] = acc_scr[...]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("params", "g_tile", "interpret")
)
def blind_rotate_fs_ps(
    params: TfheParams,
    bsk,
    lwe_in,
    testv,
    g_tile: int = 256,
    interpret: bool = False,
):
    """Prime-split fs blind rotation (see _make_kernel_fs_ps); `bsk` must
    be mxu_server_key_ps(dsk). Bit-identical to blind_rotate_fs_mb."""
    from ..fhe import ops as fops

    N, k, n = params.N, params.k, params.n
    g = params.grouping
    nv = 1 << g
    groups = n // g
    N2 = N // N1
    kp1 = k + 1
    rows = params.gadget_rows
    tab = get_tables(N)
    PRIMES = tuple(int(p) for p in tab.primes)
    NP = len(PRIMES)
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

    fst = _fs_tables(N)
    t_host = mxu_ntt.mxu_tables(N)
    abar = fops.mod_switch(jnp, lwe_in[:, :n], N).astype(jnp.int32)
    bbar = fops.mod_switch(jnp, lwe_in[:, n], N)
    neg_b = (jnp.uint32(2 * N) - bbar) & jnp.uint32(2 * N - 1)
    body = fops.negacyclic_rotate(
        jnp, jnp.broadcast_to(testv, (Gp, N)), neg_b, N
    )
    body = body.reshape(tiles, g_tile, N1, N2)
    body = jnp.transpose(body, (0, 2, 3, 1))[:, None]
    acc0 = jnp.concatenate(
        [jnp.zeros((tiles, k, N1, N2, g_tile), jnp.uint32), body], axis=1
    )
    abar_t = jnp.transpose(abar.reshape(tiles, g_tile, n), (0, 2, 1))

    # per-prime scalar + twiddle operands (SMEM)
    PROD = 1
    for _p in PRIMES:
        PROD *= _p
    si = np.zeros((NP, 2), np.uint32)
    sf = np.zeros((NP, 4), np.float32)
    for pi, p in enumerate(PRIMES):
        m = PROD // p
        w = m * pow(m, -1, p)
        si[pi, 0] = p
        si[pi, 1] = w % (1 << 32)
        sf[pi, 0] = 1.0 / p
        sf[pi, 1] = float(w / PROD)
        sf[pi, 2] = float(p)
        sf[pi, 3] = float(p // 2)
    stw_in = jnp.asarray(
        np.stack(
            [t_host["stage_tw"], t_host["stage_tw_sh"]], axis=1
        ).astype(np.uint32)
    )  # [NP, 2, LOG_N1, N1]
    istw_in = jnp.asarray(
        np.stack(
            [t_host["istage_tw"], t_host["istage_tw_sh"]], axis=1
        ).astype(np.uint32)
    )

    kernel = _make_kernel_fs_ps(params, g_tile)
    LOW = min(64, 2 * N)
    HBW = max(1, (2 * N) // LOW)
    vc = (nv - 1) * kp1

    def pmap(shape):
        nd = len(shape) - 1
        return pl.BlockSpec(
            (1,) + shape[1:],
            lambda i, j, pi, _nd=nd: (pi,) + (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    def smap(shape):
        # SMEM operands ship whole (tiny); the kernel indexes them with
        # the traced pi — blocked SMEM specs hit TPU lowering shape
        # constraints for these small shapes
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda i, j, pi, _nd=nd: (0,) * _nd,
            memory_space=pltpu.SMEM,
        )

    out = pl.pallas_call(
        kernel,
        grid=(tiles, groups, NP),
        in_specs=[
            pl.BlockSpec(
                (1, kp1, N1, N2, g_tile),
                lambda i, j, pi: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n, g_tile), lambda i, j, pi: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pmap((NP, N1, 2, N2, N2)),
            pmap((NP, N1, 2, N2, N2)),
            pmap((NP, 2, N1 * N2, LOW)),
            pmap((NP, 2, N1 * N2, HBW)),
            smap((NP, 2, LOG_N1, N1)),
            smap((NP, 2, LOG_N1, N1)),
            smap((NP, 2)),
            smap((NP, 4)),
            pl.BlockSpec(
                (1, 1, N2, vc * N1 * rows),
                lambda i, j, pi: (j, pi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, kp1, N1, N2, g_tile),
            lambda i, j, pi: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (tiles, kp1, N1, N2, g_tile), jnp.uint32
        ),
        scratch_shapes=[
            pltpu.VMEM((kp1, N1, N2, g_tile), jnp.uint32),
            pltpu.VMEM((rows, N1, N2, g_tile), jnp.int32),
            pltpu.VMEM((kp1, N1, N2, g_tile), jnp.uint32),
            pltpu.VMEM((kp1, N1, N2, g_tile), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        acc0,
        abar_t,
        jnp.asarray(fst["w2f"], dtype=jnp.bfloat16),
        jnp.asarray(fst["w2fi"], dtype=jnp.bfloat16),
        jnp.asarray(fst["tlo"], dtype=jnp.bfloat16),
        jnp.asarray(fst["thi"], dtype=jnp.bfloat16),
        stw_in,
        istw_in,
        jnp.asarray(si),
        jnp.asarray(sf),
        bsk,
    )
    acc = jnp.transpose(out, (0, 4, 1, 2, 3)).reshape(Gp, kp1, N)
    return acc[:G]


@functools.lru_cache(maxsize=None)
def _fs_tables(N: int):
    """Host-side twist and monomial tables in fs layout (numpy; cached).

    tw/twi: [N2, NP*N1] (col = pi*N1 + fA); mono: [N2, L2N*NP*N1]
    (col = (b*NP + pi)*N1 + fA). Tiny: ~180 KB each at N=1024.

    w2f/w2fi: the 128-point matmul matrices with the twists FOLDED IN as
    f32 balanced 8-bit limb pairs, [NP, N1, 2, N2, N2]. The forward twist
    is a diagonal applied before the matmul (W.T @ diag(tw) scales W.T's
    columns); the inverse twist is applied after (diag(twi) @ Wi.T scales
    rows) — folding both removes every twist Shoup chain from the kernel.
    Entry bound: fused values mod p balance to |.| <= p//2 <= 2^15, so the
    limb pairs stay |.| <= 128 (bf16-exact on the MXU's single f32 pass).

    tlo/thi: monomial lookup tables for the MXU one-hot selection of
    NTT(X^a) — tlo[pi, fA, limb, jb, e] = limbs(psi^(e * e_f mod 2N)) for
    e < LOW=min(64, 2N), thi for psi^(LOW*h*e_f), h < 2N/LOW, where e_f =
    2*bitrev(f)+1 is the evaluation exponent of fs position (fA, jb). The
    kernel computes X^a = X^(a%LOW) * X^(LOW*(a/LOW)) with two tiny
    matmuls against per-gate one-hot vectors (MXU, ~free) instead of a
    log(2N)-rung Shoup ladder (measured ~19%% of kernel time).
    """
    from ..fhe.modring import _bit_reverse, root_of_unity

    t = mxu_ntt.mxu_tables(N)
    perm = np.asarray(t["perm_from_std"])
    N2 = N // N1
    primes = t["primes"]
    NP = len(primes)
    bits = N.bit_length() - 1

    def twc(m):  # [NP, N1(jA), N2(jB)] -> [N2, NP*N1]
        return np.ascontiguousarray(
            np.transpose(m, (2, 0, 1)).reshape(N2, -1)
        )

    LOW = min(64, 2 * N)
    HB = max(1, (2 * N) // LOW)
    # flat row layout (row = fA*N2 + jb) so the kernel selects monomials
    # for ALL 8 tiles with one matmul per (prime, limb)
    tlo = np.zeros((NP, 2, N1 * N2, LOW), np.float32)
    thi = np.zeros((NP, 2, N1 * N2, HB), np.float32)
    # e_f per fs position: f_std = perm[fa*N2 + jb], e_f = 2*bitrev(f)+1
    e_f = np.zeros((N1, N2), np.int64)
    for fa in range(N1):
        for jb in range(N2):
            f = perm[fa * N2 + jb]
            e_f[fa, jb] = 2 * _bit_reverse(int(f), bits) + 1

    def bal_split(v, p):  # [..] uint -> balanced limb pair (lo, hi)
        b = np.where(v > p // 2, v.astype(np.int64) - p, v).astype(
            np.float64
        )
        hi = np.round(b / 256.0)
        lo = b - 256.0 * hi
        assert np.abs(lo).max() <= 128 and np.abs(hi).max() <= 128
        return lo.astype(np.float32), hi.astype(np.float32)

    for pi, p in enumerate(primes):
        psi = root_of_unity(p, 2 * N)
        wpow = np.ones(2 * N, np.int64)
        for i in range(1, 2 * N):
            wpow[i] = wpow[i - 1] * psi % p
        for fa in range(N1):
            ef = e_f[fa]  # [N2]
            lo_v = wpow[
                (np.arange(LOW)[None, :] * ef[:, None]) % (2 * N)
            ]  # [N2, LOW]
            hi_v = wpow[
                (LOW * np.arange(HB)[None, :] * ef[:, None]) % (2 * N)
            ]
            rows = slice(fa * N2, (fa + 1) * N2)
            tlo[pi, 0, rows], tlo[pi, 1, rows] = bal_split(lo_v, p)
            thi[pi, 0, rows], thi[pi, 1, rows] = bal_split(hi_v, p)

    w2 = (
        t["w2_limbs"][:, 0].astype(np.int64)
        + 256 * t["w2_limbs"][:, 1].astype(np.int64)
    )  # [NP, jb, fb] balanced
    w2i = (
        t["w2i_limbs"][:, 0].astype(np.int64)
        + 256 * t["w2i_limbs"][:, 1].astype(np.int64)
    )
    w2f = np.zeros((NP, N1, 2, N2, N2), np.float32)
    w2fi = np.zeros((NP, N1, 2, N2, N2), np.float32)
    for pi, p in enumerate(primes):
        for fa in range(N1):
            # fwd: out[fb, l] = sum_jb (w2[jb, fb] * tw[jb]) * x[jb, l]
            f = (w2[pi].T * t["tw"][pi, fa].astype(np.int64)[None, :]) % p
            # inv: out[jb, l] = twi[jb] * sum_fb w2i[fb, jb] * x[fb, l]
            fi = (
                w2i[pi].T * t["twi"][pi, fa].astype(np.int64)[:, None]
            ) % p
            for m, dst in ((f, w2f), (fi, w2fi)):
                b = np.where(m > p // 2, m - p, m)
                hi = np.round(b / 256.0)
                lo = b - 256.0 * hi
                assert np.abs(lo).max() <= 128 and np.abs(hi).max() <= 128
                dst[pi, fa, 0] = lo
                dst[pi, fa, 1] = hi

    return {
        "tw": twc(t["tw"]),
        "tw_sh": twc(t["tw_sh"]),
        "twi": twc(t["twi"]),
        "twi_sh": twc(t["twi_sh"]),
        "tlo": tlo,
        "thi": thi,
        "w2f": w2f,
        "w2fi": w2fi,
    }


@functools.partial(
    jax.jit,
    static_argnames=("params", "g_tile", "interpret", "ablate", "tsptw"),
)
def blind_rotate_fs_mb(
    params: TfheParams,
    bsk,
    lwe_in,
    testv,
    g_tile: int = 256,
    interpret: bool = False,
    ablate: str = "",
    tsptw: bool = False,
):
    """Multi-bit MXU blind rotation, frequency-in-sublanes layout.

    g_tile here is the number of gates per kernel batch (the lane width of
    every tile array); 256 = two vregs wide.

    tsptw=True runs the HYBRID kernel: fs transforms with the pointwise +
    subset stage transposed into the ts packed layout (cheap sublane BSK
    broadcasts instead of the 53%-of-time lane splats) — `bsk` must then
    be mxu_server_key_ts(dsk). Bit-identical to tsptw=False."""
    from ..fhe import ops as fops

    N, k, n = params.N, params.k, params.n
    g = params.grouping
    nv = 1 << g
    groups = n // g
    N2 = N // N1
    kp1 = k + 1
    rows = params.gadget_rows
    NP = len(primes_for(N))
    L2N = N.bit_length()
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

    fst = _fs_tables(N)
    abar = fops.mod_switch(jnp, lwe_in[:, :n], N).astype(jnp.int32)
    bbar = fops.mod_switch(jnp, lwe_in[:, n], N)
    neg_b = (jnp.uint32(2 * N) - bbar) & jnp.uint32(2 * N - 1)
    body = fops.negacyclic_rotate(jnp, jnp.broadcast_to(testv, (Gp, N)), neg_b, N)
    # [Gp, N] -> [tiles, N1(jA), N2(jB), G(lanes)]
    body = body.reshape(tiles, g_tile, N1, N2)
    body = jnp.transpose(body, (0, 2, 3, 1))[:, None]
    acc0 = jnp.concatenate(
        [jnp.zeros((tiles, k, N1, N2, g_tile), jnp.uint32), body], axis=1
    )
    abar_t = jnp.transpose(abar.reshape(tiles, g_tile, n), (0, 2, 1))

    kernel = _make_kernel_fs_mb(
        params, g_tile, frozenset(ablate.split(",")) - {""}, tsptw
    )

    def cmap(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda i, j, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM
        )

    if tsptw:
        # monomial tables + BSK in the ts packed layout
        from .ts_pbs import _ts_tables

        tst = _ts_tables(N)
        tlo_in = jnp.asarray(tst["tloT"], dtype=jnp.bfloat16)
        thi_in = jnp.asarray(tst["thiT"], dtype=jnp.bfloat16)
        RS = (nv - 1) * kp1 * NP * (N1 // 2) * rows
        if "blimb" in ablate:  # limb-pair rows (mxu_server_key_hb2)
            RS *= 2
        bsk_spec = pl.BlockSpec(
            (1, RS, 2 * N2), lambda i, j: (j, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        tlo_in = jnp.asarray(fst["tlo"], dtype=jnp.bfloat16)
        thi_in = jnp.asarray(fst["thi"], dtype=jnp.bfloat16)
        CC = (nv - 1) * rows * kp1 * NP * N1
        bsk_spec = pl.BlockSpec(
            (1, N2, CC), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
        )
    out = pl.pallas_call(
        kernel,
        grid=(tiles, groups),
        in_specs=[
            pl.BlockSpec(
                (1, kp1, N1, N2, g_tile), lambda i, j: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, n, g_tile), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            cmap((NP, N1, 2, N2, N2)),
            cmap((NP, N1, 2, N2, N2)),
            cmap(tuple(tlo_in.shape)),
            cmap(tuple(thi_in.shape)),
            bsk_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, kp1, N1, N2, g_tile), lambda i, j: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (tiles, kp1, N1, N2, g_tile), jnp.uint32
        ),
        scratch_shapes=[pltpu.VMEM((kp1, N1, N2, g_tile), jnp.uint32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        acc0,
        abar_t,
        # 8-bit limb tables are bf16-exact (|limb| <= 128): halves the VMEM
        # footprint of the largest kernel constants (w2f/w2fi are 2x
        # [NP, N1, 2, N2, N2] — 33 MB in f32 at N=2048)
        jnp.asarray(fst["w2f"], dtype=jnp.bfloat16),
        jnp.asarray(fst["w2fi"], dtype=jnp.bfloat16),
        tlo_in,
        thi_in,
        bsk,
    )
    # [tiles, kp1, N1, N2, G] -> [Gp, kp1, N]
    acc = jnp.transpose(out, (0, 4, 1, 2, 3)).reshape(Gp, kp1, N)
    return acc[:G]


def bootstrap_mxu(
    dsk,
    lwe_in,
    testv,
    g_tile: int | None = None,
    interpret: bool = False,
    keys=None,
):
    """Full PBS with the MXU blind rotation; bit-identical to pbs_jnp.

    grouping == 1 uses the gate-major single-bit kernel (g_tile = gates/8
    per tile, default 32); grouping > 1 uses the frequency-in-sublanes
    multi-bit kernel (g_tile = gates per tile, default 256 — two vregs of
    lanes; measured fastest and removes the BSK lane-expansion entirely).

    `keys` (from mxu_server_key / mxu_server_key_fs) must be precomputed
    and passed in when this is called inside a jit: the id()-keyed layout
    cache cannot see through tracers, so omitting it would re-lay-out the
    whole BSK on device at every launch.
    """
    from ..fhe import ops as fops
    from ..fhe.pbs_jnp import keyswitch

    if keys is None:
        keys = dsk.mxu_keys
    if dsk.params.grouping > 1:
        from .ts_pbs import (
            blind_rotate_ts_mb,
            mb_kernel,
            mxu_server_key_ts,
        )

        if g_tile is None and not interpret and os.environ.get("HELM_TPU_GT"):
            g_tile = int(os.environ["HELM_TPU_GT"])  # sweep knob
        if g_tile is None:
            # lane width of every tile array: the kernel's live set (fwd
            # rows, digits, inverse accumulators) scales with N2 * g_tile,
            # so larger rings take narrower tiles to stay inside VMEM
            g_tile = (
                8
                if interpret
                else (
                    512
                    if dsk.params.N <= 512
                    else (256 if dsk.params.N <= 1024 else 128)
                )
            )
            if not interpret:
                # LATENCY: narrow levels (single-vector circuit evaluation)
                # otherwise pad to the full tile — a 16-slot level at
                # g_tile=512 burns 32x the VPU work. Shrink the tile to the
                # batch (128-lane granularity); each batch shape compiles
                # its own executable anyway, so this costs no extra
                # compiles. Measured A/B via HELM_TPU_GT=512 override.
                gb = -(-int(lwe_in.shape[0]) // 128) * 128
                g_tile = min(g_tile, max(128, gb))
        kn = mb_kernel()
        if kn == "ts":
            bsk = keys[0] if keys is not None else mxu_server_key_ts(dsk)
            acc = blind_rotate_ts_mb(
                dsk.params, bsk, lwe_in, testv,
                g_tile=g_tile, interpret=interpret,
            )
        elif kn in ("hb", "hb2"):
            if keys is not None:
                bsk = keys[0]
            elif kn == "hb2":
                from .ts_pbs import mxu_server_key_hb2

                bsk = mxu_server_key_hb2(dsk)
            else:
                bsk = mxu_server_key_ts(dsk)
            ab = os.environ.get("HELM_TPU_HB_ABLATE", "")
            if kn == "hb2":
                ab = ",".join(x for x in ["blimb", ab] if x)
            acc = blind_rotate_fs_mb(
                dsk.params, bsk, lwe_in, testv,
                g_tile=g_tile, interpret=interpret, tsptw=True,
                ablate=ab,
            )
        elif kn == "fs16":
            bsk = keys[0] if keys is not None else mxu_server_key_fs_i16(dsk)
            acc = blind_rotate_fs_mb(
                dsk.params, bsk, lwe_in, testv,
                g_tile=g_tile, interpret=interpret,
            )
        elif kn == "ps":
            bsk = keys[0] if keys is not None else mxu_server_key_ps(dsk)
            acc = blind_rotate_fs_ps(
                dsk.params, bsk, lwe_in, testv,
                g_tile=g_tile, interpret=interpret,
            )
        else:
            bsk = keys[0] if keys is not None else mxu_server_key_fs(dsk)
            acc = blind_rotate_fs_mb(
                dsk.params, bsk, lwe_in, testv,
                g_tile=g_tile, interpret=interpret,
            )
    else:
        bsk_a, bsk_b = keys if keys is not None else mxu_server_key(dsk)
        if g_tile is None:
            g_tile = 4 if interpret else 32
        acc = blind_rotate_mxu(
            dsk.params, bsk_a, bsk_b, lwe_in, testv,
            g_tile=g_tile, interpret=interpret,
        )
    big = fops.sample_extract(jnp, acc, dsk.params.k, dsk.params.N)
    return keyswitch(dsk, big)


def _make_bootstrap_aot():
    from ..aot_cache import cached_jit

    return cached_jit(
        bootstrap_mxu,
        static_argnames=("g_tile", "interpret"),
        name="bootstrap_mxu",
    )


_bootstrap_aot = None


def bootstrap_mxu_aot(dsk, lwe_in, testv, g_tile=None, interpret=False):
    """bootstrap_mxu behind the persistent AOT executable cache.

    Jits the whole PBS (blind rotate + sample extract + keyswitch) as one
    program, serializes the compiled Mosaic executable to disk, and
    deserializes it on later processes (<10 s vs ~2.5 min compile against
    the remote TPU compiler — see helm_tpu/aot_cache.py). `dsk` must carry
    precomputed mxu_keys (DeviceServerKey.with_mxu_keys): the id()-keyed
    layout cache cannot see through tracers.
    """
    global _bootstrap_aot
    if _bootstrap_aot is None:
        _bootstrap_aot = _make_bootstrap_aot()
    return _bootstrap_aot(dsk, lwe_in, testv, g_tile=g_tile, interpret=interpret)
