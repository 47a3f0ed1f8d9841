"""Serving batch selection from the engine's ACTUAL chunking policy.

The fused MXU kernels process PBS slots in lane tiles (g_tile lanes; 512
at N<=512, narrower for larger rings — ops/mxu_pbs.py bootstrap_mxu). A
level's launch width is batch x its padded slot count, rounded UP to a
multiple of the tile — dead lanes do full blind-rotation work.

Model v3 (round 5): costs are computed from the launch shapes the engine
will REALLY use at batch B — width-adaptive chunking segments when the
engine's policy enables them (engines/boolean.py _use_adaptive), uniform
max-width chunks otherwise — not from the batch-1 uniform shapes. Two
calibrated terms ride on the lane counts:

- OVERHEAD_LANES per launch (rotation tables, monomial NTT setup,
  scan-step dispatch), calibrated on the measured uniform AES-128 fused
  batch curve 65.41/40.60/32.89 s/block at batch 1/2/4 (fits within 2%).
- tile_penalty() for launches spanning >= 3 tiles: the measured uniform
  AES curve at batch 6/8/12 (41.45/43.04/40.89 s/block) implies every
  lane of a 3-tile launch costs ~1.56x a <=2-tile lane and ~1.70x at
  >= 4 tiles (equivalently the per-TILE per-level cost series
  184/232/240/228 ms at 2/3/4/6 tiles, PERFORMANCE.md round 4) —
  something superlinear (VMEM/pipeline pressure across the grid) in
  wide launches. Encoded as a multiplier instead of round 4's hard
  2-tile batch cap, so the optimizer sees the true cost and can still
  pick a wide batch when adaptive chunking's narrower segments win it
  back.

Fit vs every measured AES-128 point (GATES_128_K3, fused): uniform
batch 1/2/4/6/8/12 = 65.41/40.60/32.89/41.45/43.04/40.89 s/block
predict within 8% (1/6/8/12 within 1%).

The ADAPTIVE path does NOT follow the uniform penalties (round-5
measurements): batch 12 adaptive = 26.68 s/block runs 18% BETTER than
the uniform-calibrated penalty predicts, while batch 4 adaptive =
32.11 s/block (vs 32.89 uniform) captures almost NONE of its predicted
15% lane saving — narrow segments save less than lane-proportional,
wide launches cost less than the uniform penalty. The two points pin an
quadratic per-level cost for adaptive segments (constants below).
History: a 2-point affine fit predicted the out-of-sample batch-8 point
within 3% (beating the rival pow2-launch-width theory, 15% off) but
extrapolated optimistically past batch 12 — batch 16 measured 28.67
vs 25.9 predicted. The quadratic refit over all four adaptive points
captures the basin (minimum around batch 8-12, rising beyond 16), and
`suggest_batch`'s 2%-tie-prefer-larger rule then picks batch 12 — the
measured serving best at 26.68 s/block.

serve.py `--batch auto` and underfill warnings ride this model.
"""

from __future__ import annotations

from .params import TfheParams

UNDERFILL_WARN = 0.75

#: per-launch fixed overhead in lane-equivalents — see module docstring
OVERHEAD_LANES = 512

def tile_penalty(tiles: int) -> float:
    """UNIFORM-path per-lane cost multiplier by launch width in 512-lane
    tiles, calibrated on the measured uniform AES-128 batch curve
    (module docstring): batch 6 (3 tiles, 1536 lanes) implies 1.56,
    batch 8 (4 tiles, 2048 lanes) implies 1.30 at the clean 90-level
    chunking (the round-5 bisect run, 34.02 s/block — the round-4
    43.04 was measured at 45-level chunks and is chunk-confounded),
    batch 12 (6 tiles) implies 1.69. Non-monotonic in tiles but
    consistent with the c7552 discriminator's finding that
    power-of-two launch widths (2048) pay less than non-pow2 ones
    (1536/3072). A lookup of measured behavior, not a theory."""
    if tiles <= 2:
        return 1.0
    if tiles == 3:
        return 1.56
    if tiles == 4:
        return 1.30
    return 1.70


#: ADAPTIVE-path per-level cost in lane-equivalents: cost(T tiles) =
#: ADAPTIVE_TILE_LANES*T + ADAPTIVE_TILE2_LANES*T^2 +
#: ADAPTIVE_LEVEL_LANES. Least-squares over the FOUR measured adaptive
#: AES points (batch 4/8/12/16 = 32.11/28.85/26.68/28.67 s/block; all
#: within +-4.4%): the batch-16 measurement showed the earlier
#: affine-in-tiles fit extrapolates optimistically past batch 12 — the
#: real curve has a basin at 8-16 and rises beyond it, captured by the
#: quadratic term. Units match the uniform model (uniform batch 4 =
#: 32.89 s/block = 1536 lane-equivalents/level).
ADAPTIVE_TILE_LANES = 470.0
ADAPTIVE_TILE2_LANES = 40.4
ADAPTIVE_LEVEL_LANES = 702.0


def tile_for(params: TfheParams, width: int, interpret: bool = False) -> int:
    """The lane tile bootstrap_mxu auto-picks for a `width`-slot launch.

    Mirrors ops/mxu_pbs.py: base tile by ring size (VMEM live set scales
    with N2 x g_tile), then narrowed to the 128-lane-rounded batch width
    (the round-3 latency lever)."""
    if interpret:
        return 8
    base = 512 if params.N <= 512 else (256 if params.N <= 1024 else 128)
    gb = -(-width // 128) * 128
    return min(base, max(128, gb))


def _policy_launch_widths(
    engine, batch: int
) -> tuple[list[int], list[int], bool]:
    """(per-launch padded slot widths, per-launch REAL slot counts,
    adaptive?) under the engine's chunking policy at `batch`.

    - per-level dispatch (no fused scan): each level launches at its own
      padded width.
    - fused + width-adaptive (engines/boolean.py _adaptive_segments):
      each level launches at its SEGMENT's max width.
    - fused uniform: every level at the global max width, plus no-op pad
      levels (0 real slots) equalizing the scan chunks.
    """
    lps = engine.plan.levels
    reals = [lp.real_slots for lp in lps]
    if getattr(engine, "_scan_stacked", None) is None:
        return [lp.slot_in.shape[0] for lp in lps], reals, False
    mn = getattr(engine, "_min_slots", 1)
    w = [max(lp.slot_in.shape[0], mn, 1) for lp in lps]
    B = max(1, int(batch))
    if engine.backend == "mxu" and engine._use_adaptive(B):
        segs, _ = engine._adaptive_segments(B)
        widths: list[int] = []
        for j, i in segs:
            S = max(w[j:i])
            widths.extend([S] * (i - j))
        return widths, reals, True
    S = max(w)
    maxc = engine._max_chunk_levels(B)
    L = len(lps)
    nch = -(-L // maxc)
    C = -(-L // nch)
    total = nch * C
    return [S] * total, reals + [0] * (total - L), False


def predicted_cost_per_vector(engine, batch: int) -> tuple[float, float]:
    """(lane-equivalents per vector, aggregate tile fill) at `batch`.

    Cost counts tile-rounded lanes (dead lanes do full PBS work), a
    >=3-tile launch penalty, and the calibrated per-launch
    OVERHEAD_LANES; fill is the fraction of launched lanes carrying REAL
    gate slots (pow2 slot padding and tile rounding both count as
    waste). Only the mxu backend has lane tiles — other backends report
    fill 1.0 and cost without tile rounding."""
    B = max(1, int(batch))
    if engine.backend != "mxu":
        lps = engine.plan.levels
        tot = float(sum(lp.slot_in.shape[0] * B for lp in lps))
        return tot / B + 0.0, 1.0
    widths, reals, adaptive = _policy_launch_widths(engine, B)
    num = den = cost = 0.0
    for w, real in zip(widths, reals):
        if w == 0:
            continue
        lw = B * w
        gt = tile_for(engine.params, lw)
        launched = -(-lw // gt) * gt
        tiles = -(-launched // 512)
        num += B * real
        den += launched
        if adaptive:
            # measured adaptive-path cost is quadratic in tiles, not
            # lane-proportional (module docstring)
            cost += (
                ADAPTIVE_TILE_LANES * tiles
                + ADAPTIVE_TILE2_LANES * tiles * tiles
                + ADAPTIVE_LEVEL_LANES
            )
        else:
            cost += launched * tile_penalty(tiles) + OVERHEAD_LANES
    return cost / B, (num / den if den else 1.0)


def suggest_batch(engine, max_batch: int = 16) -> tuple[int, list[dict]]:
    """Best batch in 1..max_batch by predicted lanes-per-vector, with the
    full table (batch, fill, cost) for logging. Ties prefer the larger
    batch (per-launch fixed overhead splits across more vectors).

    Round 4's hard 2-tile cap is GONE: the measured >=3-tile per-tile
    cost growth is modeled as tile_penalty() instead, so wide-batch
    shapes that win despite it (AES batch 12 under adaptive chunking:
    26.68 s/block vs 32.89 at the capped batch 4) are now selectable."""
    table = []
    for b in range(1, max(1, max_batch) + 1):
        cost, fill = predicted_cost_per_vector(engine, b)
        table.append({"batch": b, "fill": round(fill, 3),
                      "lanes_per_vector": round(cost, 1)})
    min_cost = min(t["lanes_per_vector"] for t in table)
    best = max(
        t["batch"] for t in table
        if t["lanes_per_vector"] <= min_cost * 1.02
    )
    return best, table


def check_batch(engine, batch: int, max_batch: int = 16) -> str | None:
    """Warning string when `batch` underfills its tiles, else None."""
    _, fill = predicted_cost_per_vector(engine, batch)
    if fill >= UNDERFILL_WARN:
        return None
    best, table = suggest_batch(engine, max_batch)
    bf = next(t["fill"] for t in table if t["batch"] == best)
    return (
        f"batch {batch} fills its kernel tiles to only {fill:.0%} — dead"
        f" lanes do full blind-rotation work. Efficient batches land just"
        f" under a multiple of the {tile_for(engine.params, 10**9)}-lane"
        f" tile; nearest suggestion: batch {best} ({bf:.0%} fill)."
    )
