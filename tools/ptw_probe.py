"""On-chip microbenchmark of pointwise-stage inner patterns (ROADMAP #1).

The fs kernel's pointwise stage is 86% of kernel time at GATES_128_K3,
and its BSK column loads ([N2,1] -> [N2,G] lane-splats) are 53%. This
probe times candidate inner loops at the real shapes (N2=64, G=512,
rows=8, (nv-1)*kp1=12 term groups, p=18433) in isolation, so a kernel
rewrite is only attempted for a pattern with a measured win:

  A    current: lane-splat column broadcast + 2 fma per (v,c2,r)
  NOB  A minus the BSK loads (calibrates the load share)
  B    transposed: gates in sublanes, freq in lanes ([G,64] arrays,
       half-filled vregs); BSK load becomes a [1,64] sublane-broadcast
  B2   transposed with two tiles packed in lanes ([G,128] arrays)
  C    MXU contraction: per (v,c2) build W*diag(b) limb mats on the fly
       and contract rows*freq -> freq with 6 bf16 passes on the MXU

Each pattern runs U units per grid step (a unit ~ one (pi,t) of one CMux
step) with a scratch feedback so Mosaic cannot hoist work across steps.
Prints ns/unit per pattern. Timing only — no crypto correctness here.
"""
import functools
import sys, pathlib, time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N2 = 64
G = 512
ROWS = 8
NVC = 12  # (nv-1) * kp1 term groups
P = 18433
IP = 1.0 / P
STEPS = 64
UNITS = 2  # (pi, t) units per grid step (small: remote compiles are slow)


def _redfb(t):
    q = jnp.floor(t * IP + 0.5)
    return t - q * P


def _tighten(t):
    hp = float(P // 2)
    t = jnp.where(t > hp, t - P, t)
    return jnp.where(t < -hp, t + P, t)


def _redfbt(t):
    return _tighten(_redfb(t))


def _split256(t):
    hi = jnp.floor(t * (1.0 / 256.0) + 0.5)
    return t - 256.0 * hi, hi


def kernel_A(slab_ref, out_ref, acc_scr):
    # slab: [N2, NVC*ROWS] f32; acc feedback [N2, G]
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_scr[...] = jnp.zeros((N2, G), jnp.float32)

    base_val = _redfbt(acc_scr[...] + 1.0)
    total = None
    for _u in range(UNITS):
        splits = []
        for r in range(ROWS):
            f = _redfbt(base_val + float(_u * ROWS + r))
            splits.append(_split256(f))
        for vc in range(NVC):
            chk = slab_ref[:, vc * ROWS : (vc + 1) * ROWS]
            slo = shi = None
            for r in range(ROWS):
                b = jnp.broadcast_to(chk[:, r : r + 1], (N2, G))
                flo, fhi = splits[r]
                plo = flo * b
                phi = fhi * b
                slo = plo if slo is None else slo + plo
                shi = phi if shi is None else shi + phi
            t = _redfbt(slo) + 256.0 * _redfbt(shi)
            total = t if total is None else total + _redfbt(t)
    acc_scr[...] = _redfbt(total)

    @pl.when(j == STEPS - 1)
    def _():
        out_ref[...] = acc_scr[...]


def kernel_NOB(slab_ref, out_ref, acc_scr):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_scr[...] = jnp.zeros((N2, G), jnp.float32)

    base_val = _redfbt(acc_scr[...] + 1.0)
    total = None
    for _u in range(UNITS):
        splits = []
        for r in range(ROWS):
            f = _redfbt(base_val + float(_u * ROWS + r))
            splits.append(_split256(f))
        for vc in range(NVC):
            slo = shi = None
            for r in range(ROWS):
                flo, fhi = splits[r]
                plo = flo * jnp.float32(3.0 + r + vc)
                phi = fhi * jnp.float32(5.0 + r + vc)
                slo = plo if slo is None else slo + plo
                shi = phi if shi is None else shi + phi
            t = _redfbt(slo) + 256.0 * _redfbt(shi)
            total = t if total is None else total + _redfbt(t)
    acc_scr[...] = _redfbt(total)

    @pl.when(j == STEPS - 1)
    def _():
        out_ref[...] = acc_scr[...]


def _kernel_T(slab_ref, out_ref, acc_scr, *, L):
    # transposed: arrays [G, L] (gates in sublanes), slab [NVC*ROWS, L]
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_scr[...] = jnp.zeros((G, L), jnp.float32)

    base_val = _redfbt(acc_scr[...] + 1.0)
    total = None
    for _u in range(UNITS):
        splits = []
        for r in range(ROWS):
            f = _redfbt(base_val + float(_u * ROWS + r))
            splits.append(_split256(f))
        for vc in range(NVC):
            slo = shi = None
            for r in range(ROWS):
                rr = vc * ROWS + r
                b = jnp.broadcast_to(slab_ref[rr : rr + 1, :], (G, L))
                flo, fhi = splits[r]
                plo = flo * b
                phi = fhi * b
                slo = plo if slo is None else slo + plo
                shi = phi if shi is None else shi + phi
            t = _redfbt(slo) + 256.0 * _redfbt(shi)
            total = t if total is None else total + _redfbt(t)
    acc_scr[...] = _redfbt(total)

    @pl.when(j == STEPS - 1)
    def _():
        out_ref[...] = acc_scr[...]


def kernel_C(w0_ref, w1_ref, bcol_ref, out_ref, acc_scr):
    # w0/w1: [ROWS*N2, N2] f32 base inverse-NTT limb weights (|.|<=128)
    # bcol: [ROWS * N2 sublane-rows?, NVC] -> per (v,c2) a [ROWS*N2] col
    # data: built from feedback, [ROWS*N2? no: x limbs [RN, G]]
    RN = ROWS * N2
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_scr[...] = jnp.zeros((RN, G), jnp.float32)

    x = _redfbt(acc_scr[...] + 1.0)  # [RN, G] balanced
    x0, x1 = _split256(x)
    x0 = x0.astype(jnp.bfloat16)
    x1 = x1.astype(jnp.bfloat16)

    def mm(w, a):
        return jax.lax.dot_general(
            w, a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    total = None
    for _u in range(UNITS):
        for vc in range(NVC):
            b = jnp.broadcast_to(bcol_ref[:, vc : vc + 1], (RN, N2))
            # scale the contraction dim of the limb weights by b, re-reduce
            s0 = _redfbt(w0_ref[...] * b)
            s1 = _redfbt(w1_ref[...] * b)
            s00, s01 = _split256(s0)
            s10, s11 = _split256(s1)
            m1 = (s01 + s10).astype(jnp.bfloat16)
            s00 = s00.astype(jnp.bfloat16)
            s11 = s11.astype(jnp.bfloat16)
            # 6 bf16 MXU passes: (s00 + 256*m1 + 2^16*s11) x (x0 + 256*x1)
            lo = mm(s00, x0)
            mid = mm(m1, x0) + mm(s00, x1)
            hi2 = mm(m1, x1) + mm(s11, x0)
            hi3 = mm(s11, x1)
            r3 = _redfbt(hi3)
            r2 = _redfbt(hi2 + 256.0 * r3)
            r1 = _redfbt(mid + 256.0 * r2)
            t = _redfbt(lo + 256.0 * r1)  # [N2, G]
            total = t if total is None else total + t
    acc_scr[...] = _redfbt(jnp.tile(total, (ROWS, 1)))

    @pl.when(j == STEPS - 1)
    def _():
        out_ref[...] = acc_scr[...]


def run(name, kern, inputs, out_shape, scratch_shape, work=1.0):
    interp = "--interp" in sys.argv
    f = pl.pallas_call(
        kern,
        grid=(STEPS,),
        interpret=interp,
        in_specs=[
            pl.BlockSpec(x.shape, lambda j, _nd=len(x.shape): (0,) * _nd,
                         memory_space=pltpu.VMEM)
            for x in inputs
        ],
        out_specs=pl.BlockSpec(
            out_shape, lambda j: (0,) * len(out_shape), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM(scratch_shape, jnp.float32)],
    )
    fj = jax.jit(f)
    t0 = time.time()
    np.asarray(fj(*inputs))
    print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fj(*inputs)
    np.asarray(o)
    dt = time.perf_counter() - t0
    ns_unit = dt / iters / STEPS / UNITS / work * 1e9
    print(f"{name}: {ns_unit:,.0f} ns/unit", flush=True)
    return ns_unit


def main():
    which = set(a for a in sys.argv[1:] if not a.startswith("-")) or {
        "A", "NOB", "B", "B2", "C"}
    if "--interp" in sys.argv:
        import jax as _j
        _j.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    slab = jnp.asarray(
        rng.integers(-P // 2, P // 2, (N2, NVC * ROWS)).astype(np.float32)
    )
    res = {}
    if "A" in which:
        res["A"] = run("A  (current lane-splat)", kernel_A, [slab],
                       (N2, G), (N2, G))
    if "NOB" in which:
        res["NOB"] = run("NOB (no BSK loads)", kernel_NOB, [slab],
                         (N2, G), (N2, G))
    if "B" in which:
        slabT = jnp.asarray(np.asarray(slab).T.copy())
        res["B"] = run(
            "B  (transposed, L=64)",
            functools.partial(_kernel_T, L=64),
            [slabT], (G, 64), (G, 64),
        )
    if "B2" in which:
        slab2 = jnp.asarray(
            rng.integers(-P // 2, P // 2, (NVC * ROWS, 128)).astype(np.float32)
        )
        res["B2"] = run(
            "B2 (transposed, L=128)",
            functools.partial(_kernel_T, L=128),
            [slab2], (G, 128), (G, 128), work=2.0,
        )
    if "C" in which:
        RN = ROWS * N2
        w0 = jnp.asarray(rng.integers(-128, 129, (RN, N2)).astype(np.float32))
        w1 = jnp.asarray(rng.integers(-36, 37, (RN, N2)).astype(np.float32))
        bcol = jnp.asarray(
            rng.integers(-P // 2, P // 2, (RN, NVC)).astype(np.float32)
        )
        res["C"] = run("C  (MXU fold, on-the-fly)", kernel_C,
                       [w0, w1, bcol], (RN, G), (RN, G))
    print({k: round(v) for k, v in res.items()})


if __name__ == "__main__":
    main()
