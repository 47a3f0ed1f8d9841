"""Netlist preprocessor: Yosys output / behavioral arith -> processed form.

Counterpart of the reference's external `preprocessor` binary (hdl-benchmarks
submodule, invoked per README.md:116-137): converts

1. gate-level structural Verilog as emitted by Yosys (`write_verilog
   -noexpr`), with named-port standard-cell or `$_AND_`-style instances,
   into HELM processed-netlist gate lines; and
2. behavioral arithmetic Verilog (`assign out = expr;` with + - * / << >>)
   into arith gate lines (`--arithmetic` mode), introducing temporaries via
   a precedence-climbing expression parser.

CLI: python -m helm_tpu.preprocessor --input X.v --output Y.v [--arithmetic]
"""

from __future__ import annotations

import argparse
import re
import sys

# ----------------------------------------------------------------------
# 1. Gate-level (Yosys) conversion
# ----------------------------------------------------------------------

# cell-name prefix -> (helm keyword, output port names)
CELL_MAP = {
    "NAND": "nand",
    "NOR": "nor",
    "XNOR": "xnor",
    "XOR": "xor",
    "AND": "and",
    "OR": "or",
    "NOT": "not",
    "INV": "not",
    "BUF": "buf",
    "DFF": "dff",
    "MUX": "mux",
}
YOSYS_INTERNAL = {
    "$_AND_": "and",
    "$_OR_": "or",
    "$_NAND_": "nand",
    "$_NOR_": "nor",
    "$_XOR_": "xor",
    "$_XNOR_": "xnor",
    "$_NOT_": "not",
    "$_BUF_": "buf",
    "$_MUX_": "mux",
    "$_DFF_P_": "dff",
    "$_DFF_N_": "dff",
}
OUT_PORTS = ("Y", "Q", "Z", "OUT")
# port order for helm gate lines
PORT_ORDER = ("A", "B", "C", "D", "S", "E", "IN", "D0", "D1")


def _cell_kind(name: str) -> str | None:
    if name in YOSYS_INTERNAL:
        return YOSYS_INTERNAL[name]
    up = name.upper()
    for prefix, kw in CELL_MAP.items():
        if up.startswith(prefix):
            return kw
    return None


_INSTANCE_RE = re.compile(
    r"^\s*([\w$\\]+)\s+([\w$\\.\[\]]+)\s*\(\s*(.*)\s*\)\s*;\s*$", re.S
)
_PORT_RE = re.compile(r"\.(\w+)\s*\(\s*([^)]*?)\s*\)")


def _flatten_statements(text: str) -> list[str]:
    # strip comments, join statements split across lines
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", "", text)
    stmts, cur = [], []
    for ch in text:
        cur.append(ch)
        if ch == ";":
            stmts.append("".join(cur).strip())
            cur = []
    if "".join(cur).strip():
        stmts.append("".join(cur).strip())
    return stmts


def _clean_name(w: str) -> str:
    return w.strip().replace("\\", "")


def convert_gates(text: str) -> str:
    """Yosys gate-level verilog -> HELM processed netlist text."""
    out_lines = []
    header: list[str] = []
    gid = 0
    for stmt in _flatten_statements(text):
        s = " ".join(stmt.split())
        if not s:
            continue
        kw = s.split()[0]
        if kw in ("module", "endmodule", "input", "output", "wire", "reg"):
            header.append(s if s.endswith(";") or kw in ("module", "endmodule") else s + ";")
            continue
        m = _INSTANCE_RE.match(stmt)
        if not m:
            continue
        cell, _inst, ports_text = m.group(1), m.group(2), m.group(3)
        kind = _cell_kind(cell)
        if kind is None:
            raise ValueError(f"unknown cell type {cell!r}")
        ports = {p.upper(): _clean_name(v) for p, v in _PORT_RE.findall(ports_text)}
        outw = None
        for op in OUT_PORTS:
            if op in ports:
                outw = ports.pop(op)
                break
        if outw is None:
            raise ValueError(f"no output port on {cell} instance: {ports}")
        ins = [ports[p] for p in PORT_ORDER if p in ports]
        gid += 1
        name = f"g{gid}"
        if kind == "mux":
            # yosys $_MUX_: A,B data, S select -> helm mux ID(in0, in1, sel, out)
            # helm semantics: out = sel ? in0 : in1 (gates.rs:189-194); yosys
            # semantics: S ? B : A
            a, b, sel = ports.get("A"), ports.get("B"), ports.get("S")
            out_lines.append(f"  mux {name}({b}, {a}, {sel}, {outw});")
        elif kind in ("not", "buf", "dff"):
            out_lines.append(f"  {kind} {name}({ins[0]}, {outw});")
        else:
            out_lines.append(f"  {kind} {name}({ins[0]}, {ins[1]}, {outw});")
    body = "\n".join(out_lines)
    hdr = "\n".join("  " + h if not h.startswith(("module", "endmodule")) else h for h in header if not h.startswith("endmodule"))
    return f"{hdr}\n{body}\nendmodule\n"


# ----------------------------------------------------------------------
# 2. Behavioral arithmetic conversion
# ----------------------------------------------------------------------

_TOKEN_RE = re.compile(r"\s*(<<|>>|[()+\-*/]|\w+)")

_PRec = {"+": 1, "-": 1, "*": 2, "/": 2, "<<": 0, ">>": 0}
_OP_GATE = {"+": "add", "-": "sub", "*": "mult", "/": "div", "<<": "shl", ">>": "shr"}


class _ExprParser:
    """Precedence-climbing parser emitting 3-address arith gates."""

    def __init__(self, emit, fresh):
        self.emit = emit
        self.fresh = fresh

    def parse(self, expr: str) -> str:
        self.toks = [t for t in _TOKEN_RE.findall(expr)]
        self.pos = 0
        result = self._expr(0)
        if self.pos != len(self.toks):
            raise ValueError(f"trailing tokens in expression: {expr!r}")
        return result

    def _peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def _next(self):
        t = self._peek()
        self.pos += 1
        return t

    def _atom(self) -> str:
        t = self._next()
        if t == "(":
            v = self._expr(0)
            if self._next() != ")":
                raise ValueError("unbalanced parentheses")
            return v
        if t is None or t in _PRec or t == ")":
            raise ValueError(f"unexpected token {t!r}")
        return t

    def _expr(self, min_prec: int) -> str:
        lhs = self._atom()
        while True:
            op = self._peek()
            if op not in _PRec or _PRec[op] < min_prec:
                return lhs
            self._next()
            rhs = self._expr(_PRec[op] + 1)
            tmp = self.fresh()
            self.emit(_OP_GATE[op], lhs, rhs, tmp)
            lhs = tmp


_ASSIGN_RE = re.compile(r"^\s*assign\s+([\w\[\]]+)\s*=\s*(.+?)\s*;\s*$", re.S)


def convert_arith(text: str) -> str:
    """Behavioral arith verilog (`assign` expressions) -> processed form."""
    header: list[str] = []
    gates: list[str] = []
    tmp_wires: list[str] = []
    counter = [0]
    gid = [0]

    def fresh() -> str:
        counter[0] += 1
        tmp_wires.append(f"_t{counter[0]}")
        return f"_t{counter[0]}"

    assigns: list[tuple[str, str]] = []
    for stmt in _flatten_statements(text):
        s = " ".join(stmt.split())
        if not s:
            continue
        kw = s.split()[0]
        if kw in ("module", "endmodule", "input", "output", "wire", "reg"):
            if not s.startswith("endmodule"):
                header.append(s)
            continue
        m = _ASSIGN_RE.match(stmt)
        if m:
            assigns.append((m.group(1), m.group(2)))
        elif s.startswith("assign"):
            raise ValueError(f"unsupported assign statement: {s!r}")

    for dst, expr in assigns:
        def emit(op, a, b, out):
            gid[0] += 1
            gates.append(f"  {op} a{gid[0]}({a}, {b}, {out});")

        parser = _ExprParser(emit, fresh)
        result = parser.parse(expr)
        if result != dst:
            if gates and gates[-1].endswith(f" {result});"):
                # retarget the last gate straight onto dst
                gates[-1] = gates[-1].replace(f" {result});", f" {dst});")
                tmp_wires.remove(result)
            else:
                gid[0] += 1
                gates.append(f"  copy a{gid[0]}({result}, {dst});")

    hdr = "\n".join(
        "  " + h if not h.startswith("module") else h for h in header
    )
    wires = f"  wire {', '.join(tmp_wires)};\n" if tmp_wires else ""
    return f"{hdr}\n{wires}" + "\n".join(gates) + "\nendmodule\n"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="helm-tpu-preprocess")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--arithmetic", action="store_true")
    args = ap.parse_args(argv)
    text = open(args.input).read()
    out = convert_arith(text) if args.arithmetic else convert_gates(text)
    with open(args.output, "w") as f:
        f.write(out)
    print(f"[✓] wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
