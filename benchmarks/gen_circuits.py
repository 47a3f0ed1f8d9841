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
    """N-bit array multiplier in Boolean gates (the `N-bit-mult` family)."""
    L = [f"module mult{nbits}(a, b, prod);"]
    L.append(f"  input [{nbits-1}:0] a;")
    L.append(f"  input [{nbits-1}:0] b;")
    L.append(f"  output [{nbits-1}:0] prod;")
    g = [0]

    def em(line):
        L.append("  " + line)

    def fresh(pfx):
        g[0] += 1
        return f"{pfx}_{g[0]}"

    # partial products
    pp = [[None] * nbits for _ in range(nbits)]
    for i in range(nbits):
        for j in range(nbits - i):
            w = fresh("pp")
            em(f"and ga{g[0]}(a[{j}], b[{i}], {w});")
            pp[i][j] = w  # weight i+j
    # column-wise ripple accumulation
    cols = [[] for _ in range(nbits)]
    for i in range(nbits):
        for j in range(nbits - i):
            cols[i + j].append(pp[i][j])
    carry_in: list[list[str]] = [[] for _ in range(nbits + 1)]
    for c in range(nbits):
        terms = cols[c] + carry_in[c]
        while len(terms) > 1:
            if len(terms) >= 3:  # full adder
                x, y, z = terms.pop(), terms.pop(), terms.pop()
                t1, s, t2, t3, co = (fresh("t") for _ in range(5))
                em(f"xor gx{g[0]}({x}, {y}, {t1});")
                em(f"xor gs{g[0]}({t1}, {z}, {s});")
                em(f"and g1{g[0]}({x}, {y}, {t2});")
                em(f"and g2{g[0]}({z}, {t1}, {t3});")
                em(f"or gc{g[0]}({t2}, {t3}, {co});")
                terms.append(s)
            else:  # half adder
                x, y = terms.pop(), terms.pop()
                s, co = fresh("s"), fresh("c")
                em(f"xor gh{g[0]}({x}, {y}, {s});")
                em(f"and gg{g[0]}({x}, {y}, {co});")
                terms.append(s)
            if c + 1 <= nbits:
                carry_in[c + 1].append(co)
        last = terms[0] if terms else None
        if last is None:
            em(f"czero z{c}(prod[{c}]);")
        else:
            em(f"buf gb{c}({last}, prod[{c}]);")
    L.append("endmodule")
    return "\n".join(L) + "\n"


def random_levelized(name: str, n_inputs: int, n_gates: int, n_outputs: int, seed: int) -> str:
    """ISCAS'85-class random combinational circuit (c880-scale stand-in:
    the real ISCAS netlists live in the non-vendored submodule)."""
    rnd = random.Random(seed)
    kinds = ["and", "or", "nand", "nor", "xor", "xnor"]
    L = [f"module {name}(i, o);", f"  input [{n_inputs-1}:0] i;", f"  output [{n_outputs-1}:0] o;"]
    wires = [f"i[{j}]" for j in range(n_inputs)]
    outs = []
    for gi in range(n_gates):
        kind = rnd.choice(kinds)
        # bias toward recent wires => realistic depth (~levels of c880)
        lo = max(0, len(wires) - 3 * n_inputs)
        w1 = wires[rnd.randrange(lo, len(wires))]
        w2 = wires[rnd.randrange(len(wires))]
        out = f"w{gi}"
        L.append(f"  {kind} g{gi}({w1}, {w2}, {out});")
        wires.append(out)
        outs.append(out)
    for j in range(n_outputs):
        L.append(f"  buf ob{j}({outs[-1-j]}, o[{j}]);")
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
    (out / "8-bit-mult.v").write_text(gate_multiplier(8))
    (out / "c880-like.v").write_text(random_levelized("c880like", 60, 383, 26, seed=880))
    (out / "c7552-like.v").write_text(random_levelized("c7552like", 207, 3512, 108, seed=7552))
    (out / "chi_squared_arith.v").write_text(CHI_SQUARED)
    (out / "crc32.v").write_text(crc32_circuit())
    print(f"wrote netlists to {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
