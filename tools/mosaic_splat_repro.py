"""Minimal Mosaic reproducer for the BSK lane-splat materialization bound.

The fs PBS kernel's pointwise stage (ops/mxu_pbs.py) is measured at
~230 ms per 1024 rotations at GATES_128_K3, of which ~96 ms is BSK
column loads + lane-splat materialization (`fs nobsk` ablation,
PERFORMANCE.md round 3). The claim under test: Mosaic materializes a
[N2, 1] -> [N2, G] lane broadcast as a full VMEM value (~write+read of
N2*G*dtype bytes per term) instead of keeping the column in lane-splatted
vregs across its two consuming fmas — and every expressible operand form
pays it. This file isolates exactly that structure, nothing else: no
NTTs, no reductions, no modular arithmetic.

Per grid step it runs T=96 terms (the per-(prime, tile) term count at
GATES_128_K3: (nv-1)*kp1*rows = 3*4*8), each term being one [N2, 1]
column lane-splat consumed by two fmas against resident [N2, G] rows —
the fs pointwise inner loop's exact shape.

Variants (all bit-identical where comparable):
  scalar  b is a per-term f32 constant — NO loads, NO splats: the pure
          fma-issue ceiling (the `nobsk` analog).
  splat   b = broadcast_to(col[:, i:i+1], (N2, G)) f32 — the production
          form.
  impl    b = col[:, i:i+1] left implicit in the multiply.
  i16     col stored int16; splat then convert (half the splat bytes,
          one extra convert per term).

Expected-if-register-resident: splat ~= scalar (a lane-splatted vreg
costs one broadcast instruction per 8-sublane group). Measured round-3
behavior predicts splat/impl run well below scalar with the gap matching
~2 x N2 x G x 4 bytes per term of VMEM traffic. Run on-chip via
tools/queue_spool; interpret mode (CPU) checks the variants agree.

Env: VARIANTS=scalar,splat,impl,i16  STEPS=512  REPS=30  INTERPRET=0
"""

import functools
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N2, G, T = 64, 512, 96  # GATES_128_K3 fs tile shape + terms/(prime, tile)


def make_kernel(variant: str):
    def kernel(col_ref, rows_ref, out_ref, acc_scr):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc_scr[...] = jnp.zeros((2, N2, G), jnp.float32)

        flo = rows_ref[0]
        fhi = rows_ref[1]
        a0 = acc_scr[0]
        a1 = acc_scr[1]
        col = col_ref[0]
        for i in range(T):
            if variant == "scalar":
                b = jnp.float32(1.0 + 0.5 * i)
            elif variant == "impl":
                b = col[:, i : i + 1]
            else:  # splat / i16
                b = jnp.broadcast_to(col[:, i : i + 1], (N2, G))
                if b.dtype != jnp.float32:
                    b = b.astype(jnp.float32)
            a0 = a0 + flo * b
            a1 = a1 + fhi * b
        # keep magnitudes bounded across steps without changing the
        # per-term op mix (one extra mul per step, amortized over T terms)
        acc_scr[0] = a0 * 0.5
        acc_scr[1] = a1 * 0.5

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            out_ref[0] = acc_scr[0] + acc_scr[1]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("variant", "steps", "interpret")
)
def run(cols, rows, variant: str, steps: int, interpret: bool):
    return pl.pallas_call(
        make_kernel(variant),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(
                (1, N2, T), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (2, N2, G), lambda j: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, N2, G), lambda j: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, N2, G), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, N2, G), jnp.float32)],
        interpret=interpret,
    )(cols, rows)


def main():
    interpret = os.environ.get("INTERPRET", "0") == "1"
    steps = int(os.environ.get("STEPS", "8" if interpret else "512"))
    reps = int(os.environ.get("REPS", "1" if interpret else "30"))
    variants = os.environ.get("VARIANTS", "scalar,splat,impl,i16").split(",")

    rng = np.random.default_rng(7)
    cols_f = rng.integers(-16384, 16384, (steps, N2, T)).astype(np.float32)
    rows = rng.integers(-128, 129, (2, N2, G)).astype(np.float32)
    rows_j = jnp.asarray(rows)

    results = {}
    outs = {}
    for v in variants:
        cols = jnp.asarray(
            cols_f.astype(np.int16) if v == "i16" else cols_f
        )
        out = np.asarray(run(cols, rows_j, v, steps, interpret))  # compile
        outs[v] = out
        t0 = time.perf_counter()
        for _ in range(reps):
            out_d = run(cols, rows_j, v, steps, interpret)
        np.asarray(out_d)
        dt = time.perf_counter() - t0
        terms = steps * T * reps
        tps = terms / dt
        # model numbers per term
        fma_elems = 2 * N2 * G  # two fmas over the tile
        splat_bytes = 2 * N2 * G * (2 if v == "i16" else 4)  # write+read
        results[v] = {
            "terms_per_s": tps,
            "elemops_per_s": tps * fma_elems,
            "dt_s": dt,
        }
        print(
            f"{v:7s}: {tps/1e6:8.2f} M terms/s  "
            f"({tps * fma_elems / 1e12:6.3f} T fma-elems/s; "
            f"splat model {splat_bytes} B/term)",
            flush=True,
        )

    if "splat" in outs and "impl" in outs:
        assert np.array_equal(outs["splat"], outs["impl"]), "splat != impl"
    if "splat" in outs and "i16" in outs:
        assert np.array_equal(outs["splat"], outs["i16"]), "splat != i16"
    if "scalar" in results and "splat" in results:
        r0 = results["scalar"]["terms_per_s"]
        r1 = results["splat"]["terms_per_s"]
        per_term_s = 1.0 / r1 - 1.0 / r0
        eff_bw = (2 * N2 * G * 4) / per_term_s if per_term_s > 0 else float("inf")
        print(
            f"splat vs scalar: {r1 / r0:.3f}x; implied splat cost "
            f"{per_term_s * 1e9:.1f} ns/term = {eff_bw / 1e9:.1f} GB/s "
            f"effective (write+read of a [64,512] f32 value per term)",
            flush=True,
        )
        print(
            "verdict: splat/scalar >= 0.95 would mean Mosaic keeps the "
            "column in lane-splatted vregs (register-resident); the "
            "measured round-3 kernel behavior predicts a large gap at "
            "VMEM-like effective bandwidth.",
            flush=True,
        )


if __name__ == "__main__":
    main()
