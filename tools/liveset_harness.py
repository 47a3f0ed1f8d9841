"""Live-set-growth harness for the fs pointwise nest's register-spill cliff.

Round 4's splat reproducer (tools/mosaic_splat_repro.py) showed the
isolated splat+2-fma loop runs near VPU peak (~1 T fma-elems/s) — the
production kernel's pointwise deficit is NOT operand traffic but the full
(v, c2, r) nest's LIVE SET (8 resident row limb-pairs, subset-poly pairs,
and ~12 running accumulators) forcing register spills around every fma
(PERFORMANCE.md round 4). A live set is a PROGRAM property; before
restructuring the kernel, this harness measures WHERE the cliff is.

Same inner structure as the reproducer — T terms per grid step, each one
[N2, 1] -> [N2, G] column lane-splat consumed by fmas — but the resident
state is parameterized:

  R  resident row pairs: term i multiplies row pair (i % R). R=1 is the
     reproducer's shape (2 resident [N2, G] rows); R=8 matches the fs
     kernel's splits list (8 limb pairs held across the whole nest).
  A  accumulator pairs: term i accumulates into pair (i % A). A=1 is the
     reproducer; A=12 matches the fs kernel's nv-1 x kp1 = 12 S pairs
     (non-fold) / D digit lanes territory.

Live set = 2R resident rows + 2A accumulators + the per-step col block,
all [N2, G] f32 = G/4 vregs each at N2=64 (a (8,128) f32 vreg holds 1024
elements). Throughput vs (R, A) locates the spill cliff; the production
nest sits at (8, 12)-ish, the reproducer at (1, 1).

Env: RS=1,2,4,8  AS=1,4,8,12,16  G=512  STEPS=256  REPS=10  INTERPRET=0
Run on-chip via tools/queue_spool.
"""

import functools
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

if os.environ.get("INTERPRET", "0") == "1":  # CPU smoke: skip axon init
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N2, T = 64, 96  # GATES_128_K3 fs tile sublanes + terms/(prime, tile)


def make_kernel(R: int, A: int, G: int, variant: str = "splat"):
    """variant:
    splat  one [N2,1]->[N2,G] lane splat + 2 fma per term (reproducer)
    red    splat + a Barrett-style reduction (t - round(t*ip)*p: mul,
           round, fma — the _redfbt op mix) on each accumulator pair
           every 8 terms, the production (v,c2) reduction density
    two    each term multiplies TWO full resident [N2, G] arrays
           (the subset-combination operand shape: p0l * tlo) instead of
           a splat — doubles the VMEM operand traffic per fma
    """
    P_, IP = 16381.0, 1.0 / 16381.0

    def kernel(col_ref, rows_ref, out_ref, acc_scr):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc_scr[...] = jnp.zeros((2 * A, N2, G), jnp.float32)

        rows = [rows_ref[i] for i in range(2 * R)]
        accs = [acc_scr[i] for i in range(2 * A)]
        col = col_ref[0]
        for i in range(T):
            r, a = i % R, i % A
            if variant == "two":
                b = rows[2 * ((i + 1) % R)]
                accs[2 * a] = accs[2 * a] + rows[2 * r] * b
                accs[2 * a + 1] = accs[2 * a + 1] + rows[2 * r + 1] * b
            else:
                b = jnp.broadcast_to(col[:, i : i + 1], (N2, G))
                accs[2 * a] = accs[2 * a] + rows[2 * r] * b
                accs[2 * a + 1] = accs[2 * a + 1] + rows[2 * r + 1] * b
            if variant == "red" and (i + 1) % 8 == 0:
                t0 = accs[2 * a]
                t1 = accs[2 * a + 1]
                accs[2 * a] = t0 - jnp.floor(t0 * IP + 0.5) * P_
                accs[2 * a + 1] = t1 - jnp.floor(t1 * IP + 0.5) * P_
        # keep magnitudes bounded without changing the per-term op mix
        for a in range(2 * A):
            acc_scr[a] = accs[a] * 0.5

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            s = acc_scr[0]
            for a in range(1, 2 * A):
                s = s + acc_scr[a]
            out_ref[0] = s

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("R", "A", "G", "steps", "interpret", "variant"),
)
def run(
    cols, rows, R: int, A: int, G: int, steps: int, interpret: bool,
    variant: str = "splat",
):
    return pl.pallas_call(
        make_kernel(R, A, G, variant),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(
                (1, N2, T), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (2 * R, N2, G), lambda j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, N2, G), lambda j: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, N2, G), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * A, N2, G), jnp.float32)],
        interpret=interpret,
    )(cols, rows)


def main():
    interpret = os.environ.get("INTERPRET", "0") == "1"
    steps = int(os.environ.get("STEPS", "4" if interpret else "256"))
    reps = int(os.environ.get("REPS", "1" if interpret else "10"))
    G = int(os.environ.get("G", "512"))
    rs = [int(x) for x in os.environ.get("RS", "1,2,4,8").split(",")]
    as_ = [int(x) for x in os.environ.get("AS", "1,4,8,12,16").split(",")]
    variants = os.environ.get("VARIANTS", "splat").split(",")

    rng = np.random.default_rng(7)
    cols = jnp.asarray(
        rng.integers(-16384, 16384, (steps, N2, T)).astype(np.float32)
    )
    fma_elems = 2 * N2 * G  # two fmas over the tile per term

    print(f"G={G} steps={steps} reps={reps} (vregs/[{N2},{G}] array: "
          f"{N2 * G // 1024})", flush=True)
    for R in rs:
        rows = jnp.asarray(
            rng.integers(-128, 129, (2 * R, N2, G)).astype(np.float32)
        )
        for A in as_:
            for v in variants:
                live = (2 * R + 2 * A) * (N2 * G // 1024)
                try:
                    out = np.asarray(
                        run(cols, rows, R, A, G, steps, interpret, v)
                    )  # compile
                    assert np.isfinite(out).all()
                    t0 = time.perf_counter()
                    for _ in range(reps):
                        out_d = run(
                            cols, rows, R, A, G, steps, interpret, v
                        )
                    np.asarray(out_d)
                    dt = time.perf_counter() - t0
                    tps = steps * T * reps / dt
                    print(
                        f"R={R:2d} A={A:2d} {v:5s} live~{live:4d} vregs: "
                        f"{tps / 1e6:8.2f} M terms/s "
                        f"({tps * fma_elems / 1e12:6.3f} T fma-elems/s)",
                        flush=True,
                    )
                except Exception as e:
                    print(f"R={R:2d} A={A:2d} {v:5s} live~{live:4d} vregs: "
                          f"FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
