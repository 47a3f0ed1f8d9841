#!/usr/bin/env python3
"""Search the TFHE parameter space for the cheapest >=104-bit core-SVP
gates-mode set under the fs-kernel cost model.

Cost model calibrated from the measured stage map (PERFORMANCE.md, fs
kernel at GATES_TPU_MB2, gt=256): pointwise share 41% with
rows*nv*kp1 = 32 units, transform share 46.6% with rows+kp1 = 6 units
=> per-(step x N x unit) weights beta = 41/32, alpha = 46.6/6. N=2048
carries a measured ~1.35x VMEM/spill penalty (predicted 1148 vs measured
848 bs/s at ARITH_TPU_MB2).

Security bar: both keys >= 104 classical core-SVP bits under
helm_tpu.fhe.security (the margin the maintained lattice-estimator
default model scores ~128 for tfhe-rs 0.4's n=742 boolean key).
Noise bar: pbs_failure_log2(linear_growth=8) <= -32 (XOR doubling is the
worst gates-mode linear combination; GATES_TPU_MB2 ships at -30.6).
"""

import math
import sys

sys.path.insert(0, ".")

from helm_tpu.params import Q, TfheParams
from helm_tpu.fhe.security import estimate_lwe_security

ALPHA = 46.6 / 6.0
BETA = 41.0 / 32.0
BASE = 256 * 1024 * (ALPHA * 6 + BETA * 32)  # GATES_TPU_MB2 cost == 3431 bs/s
MEAS = 3431.0

SEC_BITS = 104.0
FAIL_BITS = -32.0

_sig_cache = {}


def min_sigma(dim: int) -> float:
    """Smallest noise std (q ticks) giving >= SEC_BITS for dimension dim."""
    if dim in _sig_cache:
        return _sig_cache[dim]
    lo, hi = -6.0, 16.0  # log2 sigma
    if estimate_lwe_security(dim, 2.0**hi).classical_bits < SEC_BITS:
        _sig_cache[dim] = float("inf")
        return _sig_cache[dim]
    for _ in range(30):
        mid = (lo + hi) / 2
        if estimate_lwe_security(dim, 2.0**mid).classical_bits >= SEC_BITS:
            hi = mid
        else:
            lo = mid
    _sig_cache[dim] = 2.0**hi
    return _sig_cache[dim]


def cost(p: TfheParams) -> float:
    rows = (p.k + 1) * p.pbs_level
    kp1 = p.k + 1
    nv = 1 << p.grouping
    steps = p.n / p.grouping
    c = steps * p.N * (ALPHA * (rows + kp1) + BETA * rows * nv * kp1)
    if p.N == 2048:
        c *= 1.35
    return c


def main():
    cands = []
    for N in (512, 1024, 2048):
        for k in (1, 2, 3, 4):
            if k * N > 4096 or (k > 1 and N == 2048):
                continue
            # floor 4 ticks: a discrete Gaussian needs sigma >= ~4 for the
            # continuous-model security estimate to apply (repo convention;
            # sub-tick noise rounds to a noiseless, exactly-solvable key)
            sg = max(min_sigma(k * N), 4.0)
            if not math.isfinite(sg):
                continue
            for g in (1, 2):
                for n_dim in range(576, 900, 2 if g == 2 else 1):
                    if n_dim % g:
                        continue
                    sl = min_sigma(n_dim)
                    if not math.isfinite(sl):
                        continue
                    for lv in (1, 2, 3):
                        for bl in range(6, 24):
                            if bl * lv > 34:
                                continue
                            p = TfheParams(
                                name=f"cand_n{n_dim}_k{k}_N{N}_b{bl}_l{lv}_g{g}",
                                n=n_dim, k=k, N=N,
                                pbs_base_log=bl, pbs_level=lv,
                                ks_base_log=1, ks_level=14,
                                lwe_noise_std=sl, glwe_noise_std=sg,
                                msg_space_log=3, message_bits=1, grouping=g,
                            )
                            f = p.pbs_failure_log2(linear_growth=8.0)
                            if f <= FAIL_BITS:
                                cands.append((cost(p), f, p))
                                break  # cost is bl-independent; any bl works
    # for each (N,k,g) keep the best
    cands.sort(key=lambda t: t[0])
    seen = set()
    print(f"{'name':<34}{'cost_x':>7}{'pred_bs/s':>10}{'fail2^':>8}"
          f"{'lwe_sig':>9}{'glwe_sig':>9}")
    for c, f, p in cands:
        key = (p.N, p.k, p.grouping)
        if key in seen:
            continue
        seen.add(key)
        print(f"{p.name:<34}{c/BASE:>7.2f}{MEAS*BASE/c:>10.0f}{f:>8.1f}"
              f"{p.lwe_noise_std:>9.3g}{p.glwe_noise_std:>9.3g}")


if __name__ == "__main__":
    main()
