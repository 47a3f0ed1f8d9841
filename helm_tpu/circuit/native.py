"""ctypes binding to the native graph library (native/graph.cpp).

Parses + levelizes netlists in C++ for large circuits; falls back to the
Python parser/scheduler transparently when the shared library has not been
built (`make -C native`). Both paths produce identical schedules (see
tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

from .gates import Gate, GateType
from .graph import Circuit
from .verilog import Netlist, read_verilog_file

_LIB = None
_LIB_TRIED = False

_SO_PATHS = [
    Path(__file__).resolve().parents[2] / "native" / "libhelm_graph.so",
    Path(os.environ.get("HELM_TPU_NATIVE", "")) if os.environ.get("HELM_TPU_NATIVE") else None,
]


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    for p in _SO_PATHS:
        if p and p.exists():
            lib = ctypes.CDLL(str(p))
            lib.helm_parse_netlist.restype = ctypes.c_void_p
            lib.helm_parse_netlist.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.helm_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
            break
    return _LIB


def native_available() -> bool:
    return _load() is not None


_TYPE_MAP = {t.value: t for t in GateType}


def parse_and_levelize(path: str, is_arith: bool = False):
    """Returns (Netlist, Circuit with level_map populated).

    Uses the C++ library when available, else the Python path.
    """
    lib = _load()
    if lib is None:
        nl = read_verilog_file(path, is_arith)
        return nl, Circuit.from_netlist(nl)

    ptr = lib.helm_parse_netlist(path.encode(), 1 if is_arith else 0)
    try:
        text = ctypes.string_at(ptr).decode()
    finally:
        lib.helm_free(ptr)
    lines = text.splitlines()
    if not lines or lines[0].startswith("ERR"):
        msg = lines[0][4:] if lines else "native parser failed"
        raise ValueError(msg)
    assert lines[0] == "OK"
    flags = lines[1].split()
    has_luts, has_arith = flags[1] == "1", flags[2] == "1"
    inputs = lines[2].split()[1:]
    outputs = lines[3].split()[1:]
    dff_outputs = lines[4].split()[1:]

    gates: list[Gate] = []
    wire_set: set[str] = set()
    level_map: dict[int, list[Gate]] = {}
    for line in lines[5:]:
        if not line.startswith("G "):
            continue
        toks = line.split()
        level = int(toks[1])
        gtype = _TYPE_MAP[toks[2]]
        name, output = toks[3], toks[4]
        lut_const_int = int(toks[5])
        n_in = int(toks[6])
        ins = toks[7 : 7 + n_in]
        lut_const = None
        if gtype == GateType.LUT:
            size = 1 << len(ins)
            lut_const = [(lut_const_int >> i) & 1 for i in range(size)]
        g = Gate(name, gtype, ins, output, lut_const, level=level)
        gates.append(g)
        wire_set.add(output)
        level_map.setdefault(level, []).append(g)

    nl = Netlist(gates, wire_set, inputs, outputs, dff_outputs, has_luts, has_arith)
    c = Circuit([], inputs, outputs, dff_outputs)
    c.level_map = level_map
    return nl, c
