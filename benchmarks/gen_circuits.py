#!/usr/bin/env python3
"""Benchmark netlist generator.

Recreates the circuit families of the reference's hdl-benchmarks corpus
(SURVEY.md C19; the submodule is not vendored there either) in HELM
processed-netlist format: N-bit gate adders, LUT adders (2- and 3-input
LUTs), N-bit array multipliers, ISCAS'85-class random levelized circuits
(c880-scale), and the chi-squared arithmetic design.

Usage: python benchmarks/gen_circuits.py [outdir]
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

# LUT tables, index packs first input as MSB (reference src/gates.rs:159-166)
LUT2_XOR = 0b0110  # idx = a*2+b
LUT2_AND = 0b1000
LUT2_OR = 0b1110
LUT3_PARITY = 0x96  # idx = a*4+b*2+c -> popcount odd
LUT3_MAJORITY = 0xE8


def gate_adder(nbits: int) -> str:
    L = [f"module adder{nbits}(a, b, cin, sum, cout);"]
    L.append(f"  input [{nbits-1}:0] a;")
    L.append(f"  input [{nbits-1}:0] b;")
    L.append("  input cin;")
    L.append(f"  output [{nbits-1}:0] sum;")
    L.append("  output cout;")
    g = 0
    carry = "cin"
    for i in range(nbits):
        cout = "cout" if i == nbits - 1 else f"c{i+1}"
        L.append(f"  xor g{g}(a[{i}], b[{i}], x{i});")
        L.append(f"  xor g{g+1}(x{i}, {carry}, sum[{i}]);")
        L.append(f"  and g{g+2}(a[{i}], b[{i}], u{i});")
        L.append(f"  and g{g+3}({carry}, x{i}, v{i});")
        L.append(f"  or g{g+4}(u{i}, v{i}, {cout});")
        g += 5
        carry = cout
    L.append("endmodule")
    return "\n".join(L) + "\n"


def lut_adder(nbits: int, lut_inputs: int) -> str:
    """N-bit adder from w-input LUTs (the `N-bit-adder-lut-w-1` family)."""
    L = [f"module adder{nbits}lut(a, b, cin, sum, cout);"]
    L.append(f"  input [{nbits-1}:0] a;")
    L.append(f"  input [{nbits-1}:0] b;")
    L.append("  input cin;")
    L.append(f"  output [{nbits-1}:0] sum;")
    L.append("  output cout;")
    g = 0
    carry = "cin"
    for i in range(nbits):
        cout = "cout" if i == nbits - 1 else f"c{i+1}"
        if lut_inputs == 3:
            L.append(f"  lut g{g}({LUT3_PARITY}, a[{i}], b[{i}], {carry}, sum[{i}]);")
            L.append(f"  lut g{g+1}({LUT3_MAJORITY}, a[{i}], b[{i}], {carry}, {cout});")
            g += 2
        else:
            L.append(f"  lut g{g}({LUT2_XOR}, a[{i}], b[{i}], x{i});")
            L.append(f"  lut g{g+1}({LUT2_XOR}, x{i}, {carry}, sum[{i}]);")
            L.append(f"  lut g{g+2}({LUT2_AND}, a[{i}], b[{i}], u{i});")
            L.append(f"  lut g{g+3}({LUT2_AND}, {carry}, x{i}, v{i});")
            L.append(f"  lut g{g+4}({LUT2_OR}, u{i}, v{i}, {cout});")
            g += 5
        carry = cout
    L.append("endmodule")
    return "\n".join(L) + "\n"


def gate_multiplier(nbits: int) -> str:
    """N-bit multiplier in Boolean gates (the `N-bit-mult` family), mod 2^N:
    Wallace carry-save reduction + Kogge-Stone final adder — the log-depth
    structure synthesis tools emit (~50 levels at 128 bits; a naive ripple
    array is ~16k levels deep, pathological for per-level PBS launches)."""
    L = [f"module mult{nbits}(a, b, prod);"]
    L.append(f"  input [{nbits-1}:0] a;")
    L.append(f"  input [{nbits-1}:0] b;")
    L.append(f"  output [{nbits-1}:0] prod;")
    g = [0]

    def em(line):
        L.append("  " + line)

    def gate(kind: str, x: str, y: str) -> str:
        g[0] += 1
        w = f"{kind[0]}_{g[0]}"
        em(f"{kind} g{g[0]}({x}, {y}, {w});")
        return w

    # symbolic two-input ops over wire-or-None (None == constant 0)
    def AND(x, y):
        return None if x is None or y is None else gate("and", x, y)

    def XOR(x, y):
        if x is None:
            return y
        if y is None:
            return x
        return gate("xor", x, y)

    def OR(x, y):
        if x is None:
            return y
        if y is None:
            return x
        return gate("or", x, y)

    # partial products at column weight i+j (weights >= nbits drop: mod 2^N)
    cols: list[list[str]] = [[] for _ in range(nbits)]
    for i in range(nbits):
        for j in range(nbits - i):
            cols[i + j].append(gate("and", f"a[{j}]", f"b[{i}]"))
    # Wallace reduction: 3:2 compressors per column, plus a 2:2 (half
    # adder) on a remainder pair — without the HA the 2-terms+carry case
    # ripples one column per stage and the stage count degenerates to
    # O(N); with it the loop converges in ~log(N) stages (10 at 128 bits)
    while any(len(terms) > 2 for terms in cols):
        nxt: list[list[str]] = [[] for _ in range(nbits)]
        for c, terms in enumerate(cols):
            k = 0
            while len(terms) - k >= 3:
                x, y, z = terms[k : k + 3]
                k += 3
                t1 = gate("xor", x, y)
                nxt[c].append(gate("xor", t1, z))  # sum stays in column
                if c + 1 < nbits:  # carry moves one column up
                    nxt[c + 1].append(
                        gate("or", gate("and", x, y), gate("and", z, t1))
                    )
            if len(terms) - k == 2:  # half adder on the remainder pair
                x, y = terms[k:]
                nxt[c].append(gate("xor", x, y))
                if c + 1 < nbits:
                    nxt[c + 1].append(gate("and", x, y))
            else:
                nxt[c].extend(terms[k:])
        cols = nxt
    # final 2-row add via Kogge-Stone parallel prefix (log-depth carries)
    A = [terms[0] if terms else None for terms in cols]
    B = [terms[1] if len(terms) > 1 else None for terms in cols]
    p = [XOR(A[c], B[c]) for c in range(nbits)]
    G = [AND(A[c], B[c]) for c in range(nbits)]
    P = list(p)
    d = 1
    while d < nbits:
        # downward sweep reads the previous stage's G/P at c-d
        for c in range(nbits - 1, d - 1, -1):
            G[c] = OR(G[c], AND(P[c], G[c - d]))
            P[c] = AND(P[c], P[c - d])
        d *= 2
    for c in range(nbits):
        s = XOR(p[c], G[c - 1] if c else None)
        if s is None:
            em(f"czero z{c}(prod[{c}]);")
        else:
            em(f"buf gb{c}({s}, prod[{c}]);")
    L.append("endmodule")
    return "\n".join(L) + "\n"


def _level_widths(n_gates: int, depth: int, rnd) -> list[int]:
    """Distribute n_gates over `depth` levels, front-loaded (real ISCAS
    circuits are wider near the inputs and taper toward the outputs),
    every level >= 1 gate."""
    assert n_gates >= depth
    # weights decay linearly from 1.5x to 0.5x of the mean
    w = [1.5 - float(i) / max(1, depth - 1) for i in range(depth)]
    tot = sum(w)
    widths = [max(1, int(n_gates * wi / tot)) for wi in w]
    # fix rounding drift deterministically
    while sum(widths) > n_gates:
        i = max(range(depth), key=lambda j: widths[j])
        widths[i] -= 1
    while sum(widths) < n_gates:
        widths[rnd.randrange(depth)] += 1
    return widths


def random_levelized(
    name: str, n_inputs: int, n_gates: int, n_outputs: int, seed: int,
    depth: int,
) -> str:
    """ISCAS'85-class random combinational circuit at the PUBLISHED
    (inputs, gates, outputs) counts AND the published logic depth (the
    real netlists live in the non-vendored submodule; depth is what the
    per-level reference bounds and per-level PBS launches hinge on, so a
    shallower stand-in would deflate the reference floor — round-4
    verdict item 3).

    Construction is level-by-level: every gate at level l draws its
    first input from a level-(l-1) wire (forcing its level to exactly l)
    and its second input uniformly from any earlier wire."""
    rnd = random.Random(seed)
    kinds = ["and", "or", "nand", "nor", "xor", "xnor"]
    L = [f"module {name}(i, o);", f"  input [{n_inputs-1}:0] i;", f"  output [{n_outputs-1}:0] o;"]
    widths = _level_widths(n_gates, depth, rnd)
    wires = [f"i[{j}]" for j in range(n_inputs)]
    prev = list(wires)
    gi = 0
    for lw in widths:
        cur = []
        for _ in range(lw):
            kind = rnd.choice(kinds)
            w1 = prev[rnd.randrange(len(prev))]
            w2 = wires[rnd.randrange(len(wires))]
            out = f"w{gi}"
            L.append(f"  {kind} g{gi}({w1}, {w2}, {out});")
            cur.append(out)
            gi += 1
        wires.extend(cur)
        prev = cur
    for j in range(n_outputs):
        # outputs tap the deepest wires (gates are emitted level-major)
        L.append(f"  buf ob{j}({wires[-1-j]}, o[{j}]);")
    L.append("endmodule")
    return "\n".join(L) + "\n"


def random_sequential(
    name: str, n_inputs: int, n_dffs: int, n_gates: int, seed: int,
    depth: int,
) -> str:
    """ISCAS'89-class random sequential circuit at the published counts
    and published combinational logic depth (see random_levelized).
    DFF outputs are pseudo-inputs of the combinational cloud; DFF inputs
    and primary outputs tap the cloud's deepest wires."""
    rnd = random.Random(seed)
    kinds = ["and", "or", "nand", "nor", "xor", "xnor"]
    n_outputs = max(2, n_dffs // 3)
    L = [
        f"module {name}(i, o);",
        f"  input [{n_inputs-1}:0] i;",
        f"  output [{n_outputs-1}:0] o;",
    ]
    widths = _level_widths(n_gates, depth, rnd)
    wires = [f"i[{j}]" for j in range(n_inputs)] + [
        f"st{d}" for d in range(n_dffs)
    ]
    prev = list(wires)
    gi = 0
    for lw in widths:
        cur = []
        for _ in range(lw):
            kind = rnd.choice(kinds)
            w1 = prev[rnd.randrange(len(prev))]
            w2 = wires[rnd.randrange(len(wires))]
            L.append(f"  {kind} g{gi}({w1}, {w2}, w{gi});")
            cur.append(f"w{gi}")
            gi += 1
        wires.extend(cur)
        prev = cur
    n_cloud = n_inputs + n_dffs
    for d in range(n_dffs):
        src = wires[rnd.randrange(n_cloud, len(wires))]
        L.append(f"  dff d{d}({src}, st{d});")
    for j in range(n_outputs):
        L.append(f"  buf ob{j}({wires[-1-j]}, o[{j}]);")
    L.append("endmodule")
    return "\n".join(L) + "\n"


def crc32_circuit() -> str:
    """CRC-32 (IEEE 802.3 polynomial) bit-serial core: 32 DFFs, one input
    bit per cycle (the `CRC-32` family of RUNNING.md:3-259)."""
    POLY = 0x04C11DB7  # x^32 + x^26 + ... + 1, MSB-first form
    L = ["module crc32(din, crc);", "  input din;", "  output [31:0] crc;"]
    # feedback = state[31] ^ din
    L.append("  xor gfb(s31, din, fb);")
    for i in range(32):
        src = "fb" if i == 0 else (
            f"t{i}" if (POLY >> i) & 1 else f"s{i-1}"
        )
        if i > 0 and (POLY >> i) & 1:
            L.append(f"  xor gt{i}(s{i-1}, fb, t{i});")
        L.append(f"  dff d{i}({src}, s{i});")
        L.append(f"  buf go{i}(s{i}, crc[{i}]);")
    L.append("endmodule")
    return "\n".join(L) + "\n"


# ---------------------------------------------------------------------------
# AES-128 (the `aes-core`/`aes-128` family of RUNNING.md): full encryption
# with the key schedule computed in-circuit, as a LUT-mode netlist — every
# S-box output bit is one 8-input LUT (Shannon-decomposed by the engine,
# circuit/plan.py:decompose_wide_luts), the linear layer is 2-input XOR LUTs,
# and Rcon constant-XORs are 1-input NOT LUTs.
# ---------------------------------------------------------------------------


def aes_sbox() -> list[int]:
    """FIPS-197 §5.1.1 S-box, computed algebraically (GF(2^8) inverse with
    modulus x^8+x^4+x^3+x+1, then the affine transform)."""

    def gmul(a: int, b: int) -> int:
        r = 0
        while b:
            if b & 1:
                r ^= a
            a <<= 1
            if a & 0x100:
                a ^= 0x11B
            b >>= 1
        return r

    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if gmul(x, y) == 1:
                inv[x] = y
                break
    out = []
    for x in range(256):
        b = inv[x]
        s = b
        for r in range(1, 5):
            s ^= ((b << r) | (b >> (8 - r))) & 0xFF
        out.append(s ^ 0x63)
    return out


AES_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def aes_encrypt(pt: bytes, key: bytes, rounds: int = 10) -> bytes:
    """Reference AES-128 encryption (plaintext oracle for the netlist).
    rounds < 10 gives the reduced-round variant the fast encrypted tests
    use: ARK0, then `rounds` rounds with MixColumns omitted in the last."""
    sbox = aes_sbox()

    def xt(b):
        return ((b << 1) ^ (0x1B if b & 0x80 else 0)) & 0xFF

    w = [list(key[4 * i : 4 * i + 4]) for i in range(4)]
    for i in range(4, 4 * (rounds + 1)):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = [sbox[t[1]], sbox[t[2]], sbox[t[3]], sbox[t[0]]]
            t[0] ^= AES_RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    # state[r][c] = block byte c*4+r
    s = [[pt[c * 4 + r] ^ w[c][r] for c in range(4)] for r in range(4)]
    for rnd_i in range(1, rounds + 1):
        s = [[sbox[b] for b in row] for row in s]
        s = [[s[r][(c + r) % 4] for c in range(4)] for r in range(4)]
        if rnd_i != rounds:
            ns = [[0] * 4 for _ in range(4)]
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                ns[0][c] = xt(a[0]) ^ xt(a[1]) ^ a[1] ^ a[2] ^ a[3]
                ns[1][c] = a[0] ^ xt(a[1]) ^ xt(a[2]) ^ a[2] ^ a[3]
                ns[2][c] = a[0] ^ a[1] ^ xt(a[2]) ^ xt(a[3]) ^ a[3]
                ns[3][c] = xt(a[0]) ^ a[0] ^ a[1] ^ a[2] ^ xt(a[3])
            s = ns
        rk = w[4 * rnd_i : 4 * rnd_i + 4]
        s = [[s[r][c] ^ rk[c][r] for c in range(4)] for r in range(4)]
    return bytes(s[r % 4][r // 4] for r in range(16))


def aes128_circuit(rounds: int = 10, name: str = "aes128") -> str:
    """AES-128 encryption netlist. Bytes are 8 wires LSB-first; block byte
    j occupies bits [8j, 8j+8) of the 128-bit pt/key/ct vectors."""
    sbox = aes_sbox()
    lines: list[str] = []
    gid = [0]
    wid = [0]

    def fresh() -> str:
        wid[0] += 1
        return f"w{wid[0]}"

    def lut(const: int, ins: list[str], out: str) -> None:
        gid[0] += 1
        lines.append(f"  lut g{gid[0]}(0x{const:x}, {', '.join(ins)}, {out});")

    # a bit is a wire name (str) or a constant 0/1 (int)
    def bxor(a, b, out: str | None = None):
        if isinstance(a, int) and isinstance(b, int):
            assert out is None
            return a ^ b
        if isinstance(a, int):
            a, b = b, a
        if b == 0:
            assert out is None  # only Rcon bits are constants; never forced
            return a
        o = out or fresh()
        if b == 1:
            lut(0b01, [a], o)  # 1-input LUT = NOT (reference gates.rs:769)
        else:
            lut(0b0110, [a, b], o)  # idx = 2a+b -> XOR
        return o

    def xor_bytes(x, y, outs: list[str] | None = None):
        return [
            bxor(a, b, outs[i] if outs else None)
            for i, (a, b) in enumerate(zip(x, y))
        ]

    def sbox_byte(bits):  # 8 wire names LSB-first -> 8 fresh wires
        ins = list(reversed(bits))  # first LUT input = index MSB
        outs = []
        for b in range(8):
            const = 0
            for v in range(256):
                const |= ((sbox[v] >> b) & 1) << v
            o = fresh()
            lut(const, ins, o)
            outs.append(o)
        return outs

    def xtime(bits):
        return [
            bits[7],
            bxor(bits[0], bits[7]),
            bits[1],
            bxor(bits[2], bits[7]),
            bxor(bits[3], bits[7]),
            bits[4],
            bits[5],
            bits[6],
        ]

    pt = [[f"pt[{8 * j + i}]" for i in range(8)] for j in range(16)]
    key = [[f"key[{8 * j + i}]" for i in range(8)] for j in range(16)]

    # key schedule (words of 4 bytes)
    w = [key[4 * i : 4 * i + 4] for i in range(4)]
    for i in range(4, 4 * (rounds + 1)):
        t = [list(b) for b in w[i - 1]]
        if i % 4 == 0:
            t = [sbox_byte(t[1]), sbox_byte(t[2]), sbox_byte(t[3]), sbox_byte(t[0])]
            rc = AES_RCON[i // 4 - 1]
            t[0] = [bxor(t[0][k], (rc >> k) & 1) for k in range(8)]
        w.append([xor_bytes(a, b) for a, b in zip(w[i - 4], t)])

    s = [[xor_bytes(pt[c * 4 + r], w[c][r]) for c in range(4)] for r in range(4)]
    for rnd_i in range(1, rounds + 1):
        s = [[sbox_byte(b) for b in row] for row in s]
        s = [[s[r][(c + r) % 4] for c in range(4)] for r in range(4)]
        if rnd_i != rounds:
            ns = [[None] * 4 for _ in range(4)]
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                x = [xtime(b) for b in a]
                ns[0][c] = xor_bytes(xor_bytes(x[0], x[1]), xor_bytes(a[1], xor_bytes(a[2], a[3])))
                ns[1][c] = xor_bytes(xor_bytes(a[0], x[1]), xor_bytes(x[2], xor_bytes(a[2], a[3])))
                ns[2][c] = xor_bytes(xor_bytes(a[0], a[1]), xor_bytes(x[2], xor_bytes(x[3], a[3])))
                ns[3][c] = xor_bytes(xor_bytes(x[0], a[0]), xor_bytes(a[1], xor_bytes(a[2], x[3])))
            s = ns
        rk = w[4 * rnd_i : 4 * rnd_i + 4]
        is_last = rnd_i == rounds
        s = [
            [
                xor_bytes(
                    s[r][c],
                    rk[c][r],
                    outs=[f"ct[{8 * (c * 4 + r) + k}]" for k in range(8)]
                    if is_last
                    else None,
                )
                for c in range(4)
            ]
            for r in range(4)
        ]

    head = [
        f"// AES-128 encryption ({rounds} rounds), key schedule in-circuit;",
        "// S-box bits are 8-input LUTs, linear layer 2-input XOR LUTs",
        f"module {name}(pt, key, ct);",
        "  input [127:0] pt;",
        "  input [127:0] key;",
        "  output [127:0] ct;",
    ]
    return "\n".join(head + lines + ["endmodule"]) + "\n"


# ---------------------------------------------------------------------------
# AES-128 in GATES mode: composite-field S-box (Satoh/Canright construction,
# derived algorithmically below) — GF(2^8) inversion via GF((2^4)^2), all
# gates and/xor/not, ~2.4x fewer bootstraps per S-box than the Shannon'd
# 8-input LUT and it runs on the faster gates-mode parameters.
# ---------------------------------------------------------------------------


def _gf16_mul(a: int, b: int) -> int:
    """GF(2^4) with modulus w^4 + w + 1."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x10:
            a ^= 0x13
        b >>= 1
    return r


def _gf16_inv(a: int) -> int:
    if a == 0:
        return 0
    for y in range(1, 16):
        if _gf16_mul(a, y) == 1:
            return y
    raise AssertionError


# full tower GF(((2^2)^2)^2): GF(4) = GF(2)[w]/(w^2+w+1) with elements
# 2-bit ints (bit0 + bit1*w); GF(16) = GF(4)[W]/(W^2+W+PHI); GF(256) =
# GF(16)[Y]/(Y^2+Y+LAM). In this basis the GF(16) inverse is 3 GF(4)
# multiplies (GF(4) inverse == squaring, 1 XOR) — the Satoh/Canright trick.


def _g4_mul(a: int, b: int) -> int:
    a0, a1 = a & 1, a >> 1
    b0, b1 = b & 1, b >> 1
    m1 = a1 & b1
    return ((m1 ^ (a1 & b0) ^ (a0 & b1)) << 1) | ((a0 & b0) ^ m1)


PHI = 2  # w, irreducible W^2+W+w over GF(4)


def _g16_mul(x: int, y: int) -> int:
    d1, c1 = x & 3, x >> 2
    d2, c2 = y & 3, y >> 2
    m0, m1 = _g4_mul(d1, d2), _g4_mul(c1, c2)
    m2 = _g4_mul(c1 ^ d1, c2 ^ d2)
    return ((m2 ^ m0) << 2) | (m0 ^ _g4_mul(PHI, m1))


def _composite_field_maps():
    """Isomorphism GF(2^8) (x^8+x^4+x^3+x+1) -> the GF(((2^2)^2)^2) tower,
    elements encoded as bits [b0..b3, a0..a3] for aY + b (each nibble
    [d0,d1,c0,c1] for cW + d). Returns (delta_cols, delta_inv_cols, LAM)."""

    def comp_mul(u: int, v: int, lam: int) -> int:
        au, bu = (u >> 4) & 0xF, u & 0xF
        av, bv = (v >> 4) & 0xF, v & 0xF
        # (au Y + bu)(av Y + bv), Y^2 = Y + lam
        t = _g16_mul(au, av)
        a = t ^ _g16_mul(au, bv) ^ _g16_mul(bu, av)
        b = _g16_mul(t, lam) ^ _g16_mul(bu, bv)
        return (a << 4) | b

    def gf256_mul(a: int, b: int) -> int:
        r = 0
        while b:
            if b & 1:
                r ^= a
            a <<= 1
            if a & 0x100:
                a ^= 0x11B
            b >>= 1
        return r

    # lam with Y^2+Y+lam irreducible over GF(16): no y solves y^2+y = lam
    traces = {_g16_mul(y, y) ^ y for y in range(16)}
    lam = next(l for l in range(1, 16) if l not in traces)
    # root of the AES modulus in the composite field -> delta(0x02)
    for r in range(2, 256):
        # evaluate x^8 + x^4 + x^3 + x + 1 at r in the composite field
        p = [1]  # powers r^0..r^8
        for _ in range(8):
            p.append(comp_mul(p[-1], r, lam))
        if p[8] ^ p[4] ^ p[3] ^ p[1] ^ 1 == 0:
            break
    else:
        raise AssertionError("no root found")
    # delta columns: image of basis x^i
    cols = []
    v = 1
    for _ in range(8):
        cols.append(v)
        v = comp_mul(v, r, lam)

    def apply_cols(cols, x):
        y = 0
        for i in range(8):
            if (x >> i) & 1:
                y ^= cols[i]
        return y

    # invert the matrix (columns -> inverse columns) by Gaussian elim
    mat = [[(cols[c] >> r_) & 1 for c in range(8)] for r_ in range(8)]
    aug = [row + [1 if i == j else 0 for j in range(8)] for i, row in enumerate(mat)]
    for c in range(8):
        piv = next(r_ for r_ in range(c, 8) if aug[r_][c])
        aug[c], aug[piv] = aug[piv], aug[c]
        for r_ in range(8):
            if r_ != c and aug[r_][c]:
                aug[r_] = [x ^ y for x, y in zip(aug[r_], aug[c])]
    inv_cols = [
        sum(aug[r_][8 + c] << r_ for r_ in range(8)) for c in range(8)
    ]
    # sanity: delta is a field isomorphism
    import random as _rnd

    rng = _rnd.Random(0)
    for _ in range(32):
        a, b = rng.randrange(256), rng.randrange(256)
        assert apply_cols(cols, gf256_mul(a, b)) == comp_mul(
            apply_cols(cols, a), apply_cols(cols, b), lam
        )
        assert apply_cols(inv_cols, apply_cols(cols, a)) == a
    return cols, inv_cols, lam


class _GateEmitter:
    """Boolean expression builder with structural sharing; bits are wire
    names or the constants 0/1."""

    def __init__(self):
        self.lines: list[str] = []
        self.cache: dict = {}
        self.gid = 0
        self.wid = 0

    def _emit(self, kind: str, ins: list[str], out: str | None = None) -> str:
        key = (kind, tuple(sorted(ins)))
        if out is None and key in self.cache:
            return self.cache[key]
        if out is None:
            self.wid += 1
            out = f"n{self.wid}"
        self.gid += 1
        self.lines.append(f"  {kind} g{self.gid}({', '.join(ins)}, {out});")
        self.cache[key] = out
        return out

    def bxor(self, a, b, out: str | None = None):
        if isinstance(a, int) and isinstance(b, int):
            assert out is None
            return a ^ b
        if isinstance(a, int):
            a, b = b, a
        if b == 0:
            if out is None:
                return a
            return self._emit("buf", [a], out)
        if b == 1:
            return self._emit("not", [a], out)
        if a == b:
            assert out is None
            return 0
        return self._emit("xor", [a, b], out)

    def band(self, a, b):
        if a == 0 or b == 0:
            return 0
        if a == 1:
            return b
        if b == 1:
            return a
        if a == b:
            return a
        return self._emit("and", [a, b])

    def xor_many(self, bits, out: str | None = None):
        bits = [b for b in bits if not (isinstance(b, int) and b == 0)]
        if not bits:
            assert out is None
            return 0
        if len(bits) == 1:
            return self.bxor(bits[0], 0, out) if out else bits[0]
        acc = bits[0]
        for b in bits[1:-1]:
            acc = self.bxor(acc, b)
        return self.bxor(acc, bits[-1], out)

    def linear(self, cols: list[int], bits, n_out: int = None):
        """y = M x over GF(2), M given as column bitmasks (col i = image
        of input bit i). Emitted as a shared XOR network via Paar's
        greedy: repeatedly materialize the input pair that co-occurs in
        the most outputs — typically ~25% fewer XORs than per-row chains."""
        n_out = n_out or 8
        # rows as bitmasks over the current pool of terms (inputs first)
        pool = list(bits)
        rows = [
            sum(((cols[i] >> r) & 1) << i for i in range(len(bits)))
            for r in range(n_out)
        ]
        while True:
            best, besti, bestj = 1, -1, -1
            np_ = len(pool)
            counts: dict[tuple[int, int], int] = {}
            for m in rows:
                idxs = [i for i in range(np_) if (m >> i) & 1]
                for a in range(len(idxs)):
                    for b in range(a + 1, len(idxs)):
                        k = (idxs[a], idxs[b])
                        counts[k] = counts.get(k, 0) + 1
            for (i, j), c in counts.items():
                if c > best:
                    best, besti, bestj = c, i, j
            if besti < 0:
                break
            new = self.bxor(pool[besti], pool[bestj])
            pool.append(new)
            pair = (1 << besti) | (1 << bestj)
            for r in range(n_out):
                if rows[r] & pair == pair:
                    rows[r] = (rows[r] & ~pair) | (1 << (len(pool) - 1))
        outs = []
        for m in rows:
            terms = [pool[i] for i in range(len(pool)) if (m >> i) & 1]
            outs.append(self.xor_many(terms or [0]))
        return outs

    # --- GF(4) over bit pairs [lo, hi] (tower basis) -------------------
    def g4mul(self, x, y):
        m0 = self.band(x[0], y[0])
        m1 = self.band(x[1], y[1])
        m2 = self.band(self.bxor(x[0], x[1]), self.bxor(y[0], y[1]))
        return [self.bxor(m0, m1), self.bxor(m2, m0)]

    def g4sq(self, x):  # x^2 == x^-1 in GF(4)
        return [self.bxor(x[0], x[1]), x[1]]

    def g4scale_w(self, x):  # multiply by w
        return [x[1], self.bxor(x[0], x[1])]

    # --- GF(16) over 4-bit lists [d0, d1, c0, c1] = c*W + d ------------
    def g16mul(self, x, y):
        d1, c1 = x[:2], x[2:]
        d2, c2 = y[:2], y[2:]
        m0 = self.g4mul(d1, d2)
        m1 = self.g4mul(c1, c2)
        m2 = self.g4mul(
            [self.bxor(a, b) for a, b in zip(c1, d1)],
            [self.bxor(a, b) for a, b in zip(c2, d2)],
        )
        c_out = [self.bxor(a, b) for a, b in zip(m2, m0)]
        phi_m1 = self.g4scale_w(m1)
        d_out = [self.bxor(a, b) for a, b in zip(m0, phi_m1)]
        return d_out + c_out

    def g16sq(self, x):  # (cW+d)^2 = c^2 W + (d^2 + PHI c^2): linear
        c2 = self.g4sq(x[2:])
        d2 = self.g4sq(x[:2])
        pc2 = self.g4scale_w(c2)
        return [self.bxor(a, b) for a, b in zip(d2, pc2)] + c2

    def g16inv(self, x):
        """(cW+d)^-1 = (c*D)W + ((c+d)*D), D = (c^2 PHI + cd + d^2)^-1;
        the GF(4) inverse is a squaring — 3 GF(4) multiplies total."""
        d, c = x[:2], x[2:]
        cd = self.g4mul(c, d)
        pc2 = self.g4scale_w(self.g4sq(c))
        d2 = self.g4sq(d)
        delta = [
            self.bxor(self.bxor(a, b), e) for a, b, e in zip(pc2, cd, d2)
        ]
        dinv = self.g4sq(delta)
        out_c = self.g4mul(c, dinv)
        out_d = self.g4mul([self.bxor(a, b) for a, b in zip(c, d)], dinv)
        return out_d + out_c


def aes_sbox_gates(em: _GateEmitter, bits, maps=[]):
    """Emit the composite-field S-box over 8 input bit wires (LSB-first);
    returns 8 output bits (possibly with constant NOTs folded in)."""
    if not maps:
        maps.append(_composite_field_maps())
    cols, inv_cols, lam = maps[0]
    # GF(16) multiply-by-LAM is linear: column i = LAM * e_i (tower basis)
    lam_cols = [_g16_mul(lam, 1 << i) for i in range(4)]
    d = em.linear(cols, bits)  # tower representation [b(4) | a(4)]
    b, a = d[:4], d[4:]
    apb = [em.bxor(ai, bi) for ai, bi in zip(a, b)]
    # Delta = a^2 * lam + a*b + b^2 in GF(16), then one tower inverse
    ab = em.g16mul(a, b)
    a2l = em.linear(lam_cols, em.g16sq(a), 4)
    b2 = em.g16sq(b)
    delta = [em.xor_many([ab[i], a2l[i], b2[i]]) for i in range(4)]
    dinv = em.g16inv(delta)
    # inverse = (a * Dinv) Y + (a+b) * Dinv
    ia = em.g16mul(a, dinv)
    ib = em.g16mul(apb, dinv)
    comp = ib + ia
    # back to GF(2^8), then the AES affine transform + 0x63
    y = em.linear(inv_cols, comp)
    aff_cols = []
    for i in range(8):
        col = 0
        for r in range(1, 5):
            col |= 1 << ((i + r) % 8)
        col |= 1 << i
        aff_cols.append(col)
    s = em.linear(aff_cols, y)
    return [em.bxor(s[k], (0x63 >> k) & 1) for k in range(8)]


def _mixcolumns_cols() -> list[int]:
    """MixColumns as a 32x32 GF(2) matrix (column masks, input bit order
    r_in*8+k): output byte r_out = sum_r M[r_out][r]*a_r, M over GF(2^8)."""
    M = [[2, 3, 1, 1], [1, 2, 3, 1], [1, 1, 2, 3], [3, 1, 1, 2]]

    def xt_mask(k):  # bit image of x^k under xtime
        return ((1 << k) << 1) & 0xFF ^ (0x1B if k == 7 else 0)

    cols = []
    for r_in in range(4):
        for k in range(8):
            mask = 0
            for r_out in range(4):
                c = M[r_out][r_in]
                m8 = 0
                if c & 1:
                    m8 ^= 1 << k
                if c & 2:
                    m8 ^= xt_mask(k)
                mask |= m8 << (8 * r_out)
            cols.append(mask)
    return cols


def aes128_gates_circuit(rounds: int = 10, name: str = "aes128g") -> str:
    """AES-128 encryption as a pure gates netlist (and/xor/not/buf):
    composite-field S-boxes, XOR linear layer, key schedule in-circuit.
    Same wire conventions as aes128_circuit."""
    em = _GateEmitter()

    def sbox_byte(bits):
        return aes_sbox_gates(em, bits)

    def xor_bytes(x, y, outs=None):
        return [
            em.bxor(p, q, outs[i] if outs else None)
            for i, (p, q) in enumerate(zip(x, y))
        ]

    pt = [[f"pt[{8 * j + i}]" for i in range(8)] for j in range(16)]
    key = [[f"key[{8 * j + i}]" for i in range(8)] for j in range(16)]
    w = [key[4 * i : 4 * i + 4] for i in range(4)]
    for i in range(4, 4 * (rounds + 1)):
        t = [list(bb) for bb in w[i - 1]]
        if i % 4 == 0:
            t = [sbox_byte(t[1]), sbox_byte(t[2]), sbox_byte(t[3]), sbox_byte(t[0])]
            rc = AES_RCON[i // 4 - 1]
            t[0] = [em.bxor(t[0][k], (rc >> k) & 1) for k in range(8)]
        w.append([xor_bytes(p, q) for p, q in zip(w[i - 4], t)])
    s = [[xor_bytes(pt[c * 4 + r], w[c][r]) for c in range(4)] for r in range(4)]
    for rnd_i in range(1, rounds + 1):
        s = [[sbox_byte(bb) for bb in row] for row in s]
        s = [[s[r][(c + r) % 4] for c in range(4)] for r in range(4)]
        if rnd_i != rounds:
            mc = _mixcolumns_cols()
            ns = [[None] * 4 for _ in range(4)]
            for c in range(4):
                col_bits = [bit for r in range(4) for bit in s[r][c]]
                y = em.linear(mc, col_bits, 32)
                for r in range(4):
                    ns[r][c] = y[8 * r : 8 * r + 8]
            s = ns
        rk = w[4 * rnd_i : 4 * rnd_i + 4]
        is_last = rnd_i == rounds
        s = [
            [
                xor_bytes(
                    s[r][c],
                    rk[c][r],
                    outs=[f"ct[{8 * (c * 4 + r) + k}]" for k in range(8)]
                    if is_last
                    else None,
                )
                for c in range(4)
            ]
            for r in range(4)
        ]
    head = [
        f"// AES-128 encryption ({rounds} rounds), gates mode: composite-field",
        "// GF((2^4)^2) S-boxes (Satoh/Canright), key schedule in-circuit",
        f"module {name}(pt, key, ct);",
        "  input [127:0] pt;",
        "  input [127:0] key;",
        "  output [127:0] ct;",
    ]
    return "\n".join(head + em.lines + ["endmodule"]) + "\n"


CHI_SQUARED = """\
// chi-squared test (iDASH) — behavioral arithmetic, HELM processed form
// alpha=(4 n0 n2 - n1^2)^2; beta1=2(2 n0+n1)^2; beta2=(2 n0+n1)(2 n2+n1);
// beta3=2(2 n2+n1)^2  (reference README.md:116-137 recipe)
module chi_squared(n0, n1, n2, alpha, beta1, beta2, beta3);
  input [31:0] n0, n1, n2;
  output [31:0] alpha, beta1, beta2, beta3;
  wire t0, t1, t2, t3, t4, t5, t6, t7, t8, t9;

  mult m0(n0, n2, t0);
  mult m1(t0, 4, t1);
  mult m2(n1, n1, t2);
  sub s0(t1, t2, t3);
  mult m3(t3, t3, alpha);
  mult m4(n0, 2, t4);
  add a0(t4, n1, t5);
  mult m5(t5, t5, t6);
  mult m6(t6, 2, beta1);
  mult m7(n2, 2, t7);
  add a1(t7, n1, t8);
  mult m8(t5, t8, beta2);
  mult m9(t8, t8, t9);
  mult m10(t9, 2, beta3);
endmodule
"""


def random_arith(name: str, n_inputs: int, n_gates: int, seed: int) -> str:
    """Random arithmetic DAG (fuzz target for the dataflow scheduler):
    add/sub/mult (ct and plain-const), plain shifts (incl. >= width),
    copy, and the occasional div."""
    rnd = random.Random(seed)
    ios = ", ".join(f"x{i}" for i in range(n_inputs))
    L = [
        f"module {name}({ios}, " +
        ", ".join(f"y{i}" for i in range(4)) + ");",
        f"  input [31:0] {ios};",
        "  output [31:0] " + ", ".join(f"y{i}" for i in range(4)) + ";",
    ]
    wires = [f"x{i}" for i in range(n_inputs)]
    for g in range(n_gates):
        out = f"y{g - n_gates + 4}" if g >= n_gates - 4 else f"t{g}"
        a = rnd.choice(wires)
        b = rnd.choice(wires)
        r = rnd.random()
        if r < 0.25:
            L.append(f"  add g{g}({a}, {b}, {out});")
        elif r < 0.45:
            L.append(f"  sub g{g}({a}, {b}, {out});")
        elif r < 0.60:
            L.append(f"  mult g{g}({a}, {b}, {out});")
        elif r < 0.70:
            c = rnd.randrange(256)
            pos = rnd.random() < 0.5
            L.append(
                f"  mult g{g}({c}, {a}, {out});"
                if pos
                else f"  mult g{g}({a}, {c}, {out});"
            )
        elif r < 0.78:
            kind = "shl" if rnd.random() < 0.5 else "shr"
            amt = rnd.randrange(11)  # incl. >= width at u8
            L.append(f"  {kind} g{g}({a}, {amt}, {out});")
        elif r < 0.84:
            L.append(f"  copy g{g}({a}, {out});")
        elif r < 0.88:
            L.append(f"  mult g{g}({a}, {a}, {out});")  # squaring path
        elif r < 0.94:
            L.append(f"  div g{g}({a}, {rnd.randrange(1, 12)}, {out});")
        else:
            L.append(f"  div g{g}({a}, {b}, {out});")
        wires.append(out)
    L.append("endmodule")
    return "\n".join(L) + "\n"


def euclidean_arith(n: int) -> str:
    """Squared Euclidean distance at size n (euclidean family,
    RUNNING.md runs n=32/64): dist = sum_i (a_i - b_i)^2."""
    ios = ", ".join(f"a{i}" for i in range(n)) + ", " + ", ".join(
        f"b{i}" for i in range(n)
    )
    L = [
        f"// squared Euclidean distance, n={n} (euclidean family of RUNNING.md)",
        f"module euclidean{n}({ios}, dist);",
    ]
    for pre in ("a", "b"):
        L.append(
            f"  input [31:0] " + ", ".join(f"{pre}{i}" for i in range(n)) + ";"
        )
    L.append("  output [31:0] dist;")
    for i in range(n):
        L.append(f"  sub u{i}(a{i}, b{i}, d{i});")
        L.append(f"  mult m{i}(d{i}, d{i}, q{i});")
    # log-depth add tree
    terms = [f"q{i}" for i in range(n)]
    t = 0
    while len(terms) > 1:
        nxt = []
        for k in range(0, len(terms) - 1, 2):
            out = "dist" if len(terms) == 2 else f"s{t}"
            L.append(f"  add ad{t}({terms[k]}, {terms[k+1]}, {out});")
            nxt.append(out)
            t += 1
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    L.append("endmodule")
    return "\n".join(L) + "\n"


def mmult_arith(k: int) -> str:
    """k x k encrypted matrix multiply (mmult family, RUNNING.md runs
    5x5..15x15): c[i][j] = sum_l a[i][l]*b[l][j]."""
    # underscore-separated indices: f"a{i}{l}" is ambiguous once k >= 10
    a_ios = ", ".join(f"a{i}_{l}" for i in range(k) for l in range(k))
    b_ios = ", ".join(f"b{l}_{j}" for l in range(k) for j in range(k))
    c_ios = ", ".join(f"c{i}_{j}" for i in range(k) for j in range(k))
    L = [
        f"// {k}x{k} matrix multiply (mmult family of RUNNING.md)",
        f"module mmult{k}({a_ios}, {b_ios}, {c_ios});",
        f"  input [31:0] {a_ios};",
        f"  input [31:0] {b_ios};",
        f"  output [31:0] {c_ios};",
    ]
    g = 0
    for i in range(k):
        for j in range(k):
            prods = []
            for l in range(k):
                L.append(f"  mult m{g}(a{i}_{l}, b{l}_{j}, p{g});")
                prods.append(f"p{g}")
                g += 1
            while len(prods) > 1:
                nxt = []
                for z in range(0, len(prods) - 1, 2):
                    out = f"c{i}_{j}" if len(prods) == 2 else f"t{g}"
                    L.append(f"  add ad{g}({prods[z]}, {prods[z+1]}, {out});")
                    nxt.append(out)
                    g += 1
                if len(prods) % 2:
                    nxt.append(prods[-1])
                prods = nxt
    L.append("endmodule")
    return "\n".join(L) + "\n"


def main(outdir: str = "benchmarks/netlists"):
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "8-bit-adder.v").write_text(gate_adder(8))
    (out / "16-bit-adder.v").write_text(gate_adder(16))
    (out / "32-bit-adder.v").write_text(gate_adder(32))
    (out / "128-bit-adder.v").write_text(gate_adder(128))
    (out / "8-bit-adder-lut-3-1.v").write_text(lut_adder(8, 3))
    (out / "8-bit-adder-lut-2-1.v").write_text(lut_adder(8, 2))
    (out / "16-bit-mult.v").write_text(gate_multiplier(16))
    (out / "32-bit-mult.v").write_text(gate_multiplier(32))
    (out / "64-bit-mult.v").write_text(gate_multiplier(64))
    (out / "128-bit-mult.v").write_text(gate_multiplier(128))
    (out / "8-bit-mult.v").write_text(gate_multiplier(8))
    # ISCAS'85 stand-ins at the published (inputs, gates, outputs) sizes
    # AND published logic depths (README.md:70-113 / RUNNING.md family
    # list; depths are the standard published ISCAS'85 level counts —
    # c880 24, c1355 24, c1908 40, c2670 32, c3540 47, c5315 49,
    # c6288 124, c7552 43. Real netlists live in the non-vendored
    # hdl-benchmarks submodule.)
    (out / "c880-like.v").write_text(random_levelized("c880like", 60, 383, 26, seed=880, depth=24))
    (out / "c1355-like.v").write_text(random_levelized("c1355like", 41, 546, 32, seed=1355, depth=24))
    (out / "c1908-like.v").write_text(random_levelized("c1908like", 33, 880, 25, seed=1908, depth=40))
    (out / "c2670-like.v").write_text(random_levelized("c2670like", 233, 1193, 140, seed=2670, depth=32))
    (out / "c3540-like.v").write_text(random_levelized("c3540like", 50, 1669, 22, seed=3540, depth=47))
    (out / "c5315-like.v").write_text(random_levelized("c5315like", 178, 2307, 123, seed=5315, depth=49))
    (out / "c6288-like.v").write_text(random_levelized("c6288like", 32, 2416, 32, seed=6288, depth=124))
    (out / "c7552-like.v").write_text(random_levelized("c7552like", 207, 3512, 108, seed=7552, depth=43))
    # ISCAS'89 stand-ins; published combinational depths s386 11,
    # s1488 17, s15850 82
    (out / "s386-like.v").write_text(random_sequential("s386like", 7, 6, 159, seed=386, depth=11))
    (out / "s1488-like.v").write_text(random_sequential("s1488like", 8, 6, 653, seed=1488, depth=17))
    (out / "s15850-like.v").write_text(
        random_sequential("s15850like", 77, 534, 9772, seed=15850, depth=82)
    )
    (out / "chi_squared_arith.v").write_text(CHI_SQUARED)
    (out / "crc32.v").write_text(crc32_circuit())
    (out / "aes128.v").write_text(aes128_circuit(10))
    (out / "aes128-gates.v").write_text(aes128_gates_circuit(10))
    (out / "euclidean32_arith.v").write_text(euclidean_arith(32))
    (out / "euclidean64_arith.v").write_text(euclidean_arith(64))
    (out / "mmult5_arith.v").write_text(mmult_arith(5))
    (out / "mmult10_arith.v").write_text(mmult_arith(10))
    (out / "mmult15_arith.v").write_text(mmult_arith(15))
    print(f"wrote netlists to {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
