"""Tile-quantization-aware batch selection for serving.

The fused MXU kernels process PBS slots in lane tiles (g_tile lanes; 512
at N<=512, narrower for larger rings — ops/mxu_pbs.py bootstrap_mxu).
A level's launch width is batch x its padded slot count, rounded UP to a
multiple of the tile — dead lanes do full blind-rotation work. Measured
consequence (PERFORMANCE.md round 3): AES-128 batch 6 is SLOWER per block
than batch 4 because ~700 slots/level spill into a second 512-lane tile
at ~68% fill, while batch 4 fills one tile at ~91%. The efficient batch
points land just UNDER a multiple of the tile, not "bigger is better".

This module encodes that model so serving chooses efficient shapes
automatically (serve.py `--batch auto`) and warns when a requested batch
underfills its tiles (<75%).
"""

from __future__ import annotations

from .params import TfheParams

UNDERFILL_WARN = 0.75


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


#: per-level-launch fixed overhead in lane-equivalents (rotation tables,
#: monomial NTT setup, scan-step dispatch). Calibrated on the measured
#: AES-128 fused batch curve at GATES_128_K3 (65.41/40.60/32.89 s/block
#: at batch 1/2/4): cost ~ (B*S_launch + OVERHEAD)/B reproduces all three
#: points within 2%. This term is what batching amortizes on circuits
#: whose launch widths are already tile-aligned.
OVERHEAD_LANES = 512


def _launch_widths(engine) -> tuple[list[int], list[int]]:
    """(per-launch padded slot widths, per-launch REAL slot counts).

    Fused scans pad every level to the max width and append no-op levels
    to equalize chunks — all of which launch at full width but carry only
    the underlying level's real slots (0 for the no-op pads)."""
    lps = engine.plan.levels
    widths = [lp.slot_in.shape[0] for lp in lps]
    reals = [lp.real_slots for lp in lps]
    if engine._scan_levels is not None:
        S = engine._scan_levels[0]["slot_in"].shape[1]
        n_scan = sum(c["slot_in"].shape[0] for c in engine._scan_levels)
        reals = reals + [0] * (n_scan - len(lps))
        return [S] * n_scan, reals
    return widths, reals


def predicted_cost_per_vector(engine, batch: int) -> tuple[float, float]:
    """(lane-equivalents per vector, aggregate tile fill) at `batch`.

    Cost counts tile-rounded lanes (dead lanes do full PBS work) plus the
    calibrated per-launch OVERHEAD_LANES; fill is the fraction of
    launched lanes that carry REAL gate slots (pow2 slot padding and tile
    rounding both count as waste). Only the mxu backend has lane tiles —
    other backends report fill 1.0 and cost without tile rounding."""
    B = max(1, int(batch))
    widths, reals = _launch_widths(engine)
    if engine.backend != "mxu":
        tot = float(sum(w * B for w in widths))
        return tot / B + 0.0, 1.0
    num = den = cost = 0
    for w, real in zip(widths, reals):
        if w == 0:
            continue
        lw = B * w
        gt = tile_for(engine.params, lw)
        launched = -(-lw // gt) * gt
        num += B * real
        den += launched
        cost += launched + OVERHEAD_LANES
    return cost / B, (num / den if den else 1.0)


def suggest_batch(engine, max_batch: int = 16) -> tuple[int, list[dict]]:
    """Best batch in 1..max_batch by padded-lanes-per-vector, with the
    full table (batch, fill, cost) for logging. Ties prefer the larger
    batch (per-level fixed overhead — rotation tables, monomial NTTs,
    dispatch — splits across more vectors).

    Measured hard cap (AES-128 serving curve, round 4: 32.89 s/block at
    batch 4 vs 41.45/43.04/40.89 at 6/8/12): launches beyond TWO full
    512-lane tiles pay ~25% more per tile and the curve plateaus WORSE —
    so fused-path suggestions never exceed the largest batch whose
    per-level launch fits 2 tiles. Serving more vectors than that is
    better done as multiple evaluations at the capped batch."""
    widths, _ = _launch_widths(engine)
    max_w = max((w for w in widths if w), default=1)
    cap = max_batch
    if engine.backend == "mxu" and getattr(engine, "_scan_levels", None) is not None:
        cap = min(max_batch, max(1, (2 * 512) // max_w))
    table = []
    for b in range(1, max(1, max_batch) + 1):
        cost, fill = predicted_cost_per_vector(engine, b)
        table.append({"batch": b, "fill": round(fill, 3),
                      "lanes_per_vector": round(cost, 1)})
    eligible = [t for t in table if t["batch"] <= cap] or table
    min_cost = min(t["lanes_per_vector"] for t in eligible)
    best = max(
        t["batch"] for t in eligible
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
