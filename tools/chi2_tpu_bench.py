"""Arith-mode on-chip bench: chi_squared u32 by default (a BASELINE
config), any arith netlist via NETLIST/WIDTH env (e.g. box_blur_arith.v).

Env: PARAMS (helm_tpu.params name), BACKEND=jnp|mxu, BATCH (serving
vectors per pass), NETLIST, WIDTH=u8..u128.
NETLISTS: space-separated `path[:width[:batch]]` entries — runs them all
in ONE process (engines cached per width, so keygen/key-transfer happen
once per width, not once per family). Overrides NETLIST/WIDTH/BATCH.
Prints one RESULT json line per netlist for the measurement matrix.
"""
import json
import sys, pathlib, time, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from helm_tpu.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np
from helm_tpu import params as P
from helm_tpu.circuit.verilog import read_verilog_file
from helm_tpu.circuit.graph import Circuit
from helm_tpu.engines.arith import ArithEngine

if os.environ.get("BACKEND", "jnp") == "mxu":
    from helm_tpu.engines import radix

    radix.BACKEND[0] = "mxu"

if os.environ.get("NETLISTS", ""):
    jobs = []
    for ent in os.environ["NETLISTS"].split():
        parts = ent.split(":")
        jobs.append(
            (
                parts[0],
                parts[1] if len(parts) > 1 else "u32",
                int(parts[2]) if len(parts) > 2 else 1,
            )
        )
else:
    jobs = [
        (
            os.environ.get("NETLIST", "benchmarks/netlists/chi_squared_arith.v"),
            os.environ.get("WIDTH", "u32"),
            int(os.environ.get("BATCH", "1")),
        )
    ]

pset = getattr(P, os.environ["PARAMS"]) if os.environ.get("PARAMS") else None
engines = {}  # width -> ArithEngine (keygen + key transfer once per width)

for path, width, B in jobs:
    bits = int(width[1:])
    nl = read_verilog_file(path, True)
    if width not in engines:
        t0 = time.time()
        # default: production ARITH_PARAMS
        engines[width] = ArithEngine(width, params=pset, seed=11)
        print(f"KeyGen[{width}] {time.time()-t0:.1f}s", flush=True)
    e = engines[width]
    e.compile(nl)
    if "chi_squared" in path:
        base = {"n0": 10, "n1": 20, "n2": 30}  # the recorded-vector-1 inputs
    else:
        base = {
            w: (11 * j + 10) % (1 << min(bits, 16))
            for j, w in enumerate(sorted(nl.inputs))
        }
    vecs = [
        {k: v + 7 * i for k, v in base.items()} for i in range(B)
    ]
    inputs = vecs if B > 1 else base
    wires = e.encrypt_inputs(inputs)
    t0 = time.time()
    wires = e.evaluate(wires)
    _ = np.asarray(wires)
    first = time.time() - t0
    print(f"first evaluation (incl. compiles): {first:.1f}s", flush=True)
    w2 = e.encrypt_inputs(inputs)
    t0 = time.time()
    w2 = e.evaluate(w2)
    _ = np.asarray(w2)
    dt = time.time() - t0
    name = pathlib.Path(path).stem
    print(
        f"steady-state {name} {width} eval: {dt:.2f}s"
        + (f" ({dt / B:.2f}s/vector at batch {B})" if B > 1 else ""),
        flush=True,
    )
    out = e.decrypt_outputs(w2)
    c = Circuit.from_netlist(read_verilog_file(path, True))
    outs = out if isinstance(out, list) else [out]
    ok = True
    for vi, o in enumerate(outs):
        exp = c.evaluate_arith(
            c.initialize_wire_map(nl.wire_set, vecs[vi], default=0), bits
        )
        ok = ok and all(o[w] == exp[w] for w in o)
    print("outputs:", outs[0], flush=True)
    print("correct:", ok, flush=True)

    # analytic reference bounds for arith mode (helm_tpu/refbound.py):
    # documented tfhe-rs radix PBS-count floors per op, generous to the
    # reference (reference src/gates.rs:306-702 + bin/helm.rs:81-88)
    from helm_tpu.refbound import arith_reference_bounds

    rb = arith_reference_bounds(
        c, bits, cores=int(os.environ.get("REF_CORES", "64"))
    )
    pv = dt / (B or 1)
    print(
        "RESULT "
        + json.dumps(
            {
                "family": name,
                "mode": "arith",
                "params": (pset.name if pset else "ARITH_PARAMS"),
                "width": width,
                "batch": B,
                "steady_s": round(dt, 3),
                "per_vector_s": round(dt / (B or 1), 3),
                "first_s": round(first, 1),
                "correct": ok,
                "ref_infinite_core_floor_s": rb["infinite_core_floor_s"],
                "ref_core_bound_s": rb["core_bound_s"],
                "ref_cores": rb["cores"],
                "ref_bootstraps": rb["bootstraps"],
                "vs_ref_floor": round(rb["infinite_core_floor_s"] / pv, 3),
                "vs_ref_cores": round(rb["core_bound_s"] / pv, 3),
                "bounds_model": rb["model"],
            }
        ),
        flush=True,
    )
