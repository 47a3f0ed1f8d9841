"""Batched programmable bootstrapping — pure-jnp pipeline.

One launch bootstraps G independent gates at once: this is the TPU-native
generalization of the reference's per-level batching (rayon threads at
circuit.rs:531; grouped CUDA vector launches at circuit.rs:650-934), with a
single fused path instead of per-gate-type kernels — the gate type only
changes the linear combination and (in LUT mode) the test polynomial.

This module is the correctness reference and the CPU/multi-chip-dryrun
implementation; ops/pallas_pbs.py implements the same math as a fused
VMEM-resident kernel.  Both produce bit-identical results (exact integer
arithmetic everywhere).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..params import TfheParams
from . import ops
from .modring import NUM_PRIMES, NttTables, get_tables
from .ntt import (
    digits_to_residues,
    garner_to_u32,
    mul_shoup,
    ntt_fwd,
    ntt_inv,
    reduce_small_sum,
)
from .server_key import ServerKey


@dataclass(frozen=True)
class DeviceServerKey:
    """Server key resident on device (jnp arrays) + static metadata."""

    params: TfheParams
    tab: NttTables
    bsk_ntt: jax.Array  # u32 [n, rows, k+1, NP, N]
    bsk_ntt_sh: jax.Array
    ksk_limbs: jax.Array  # i8 [4, big_n*ks_level, n+1]

    @staticmethod
    def from_host(sk: ServerKey) -> "DeviceServerKey":
        return DeviceServerKey(
            params=sk.params,
            tab=get_tables(sk.params.N),
            bsk_ntt=jnp.asarray(sk.bsk_ntt),
            bsk_ntt_sh=jnp.asarray(sk.bsk_ntt_sh),
            ksk_limbs=jnp.asarray(sk.ksk_limbs),
        )


jax.tree_util.register_pytree_node(
    DeviceServerKey,
    lambda k: ((k.bsk_ntt, k.bsk_ntt_sh, k.ksk_limbs), (k.params, k.tab)),
    lambda aux, ch: DeviceServerKey(aux[0], aux[1], *ch),
)


def blind_rotate(
    dsk: DeviceServerKey, lwe_in: jax.Array, testv: jax.Array
) -> jax.Array:
    """Blind rotation of per-gate test polys by per-gate phases.

    lwe_in: u32 [G, n+1]; testv: u32 [G, N] or [1, N].
    Returns the GLWE accumulator batch u32 [G, k+1, N].
    """
    p = dsk.params
    tab = dsk.tab
    n, N, k = p.n, p.N, p.k
    G = lwe_in.shape[0]
    rows = (k + 1) * p.pbs_level
    primes_col = jnp.asarray(tab.primes).reshape(NUM_PRIMES, 1)

    abar = ops.mod_switch(jnp, lwe_in[:, :n], N)  # [G, n] in [0, 2N)
    bbar = ops.mod_switch(jnp, lwe_in[:, n], N)  # [G]

    # acc = X^{-bbar} * testv  (as trivial GLWE)
    neg_b = (jnp.uint32(2 * N) - bbar) & jnp.uint32(2 * N - 1)
    body = ops.negacyclic_rotate(jnp, jnp.broadcast_to(testv, (G, N)), neg_b, N)
    acc = jnp.concatenate(
        [jnp.zeros((G, k, N), jnp.uint32), body[:, None, :]], axis=1
    )

    def step(acc, xs):
        bsk_i, bsk_sh_i, a_i = xs  # [rows,k+1,NP,N] x2, [G]
        rot = ops.negacyclic_rotate(jnp, acc, a_i[:, None], N)
        diff = rot - acc  # u32 wrap
        digits = ops.signed_decompose(jnp, diff, p.pbs_base_log, p.pbs_level)
        # [l, G, k+1, N] -> rows order c*l + j
        d = jnp.transpose(digits, (1, 2, 0, 3)).reshape(G, rows, N)
        res = digits_to_residues(jnp, d, primes_col)  # [G, rows, NP, N]
        f = ntt_fwd(jnp, res, tab)
        outs = []
        for c in range(k + 1):
            s = None
            for r in range(rows):
                t = mul_shoup(
                    jnp, f[:, r], bsk_i[r, c], bsk_sh_i[r, c], primes_col
                )
                s = t if s is None else s + t
            s = reduce_small_sum(jnp, s, primes_col, rows + 1)
            outs.append(s)
        prod = jnp.stack(outs, axis=1)  # [G, k+1, NP, N]
        conv = garner_to_u32(jnp, ntt_inv(jnp, prod, tab), tab)
        return acc + conv, None

    acc, _ = jax.lax.scan(
        step, acc, (dsk.bsk_ntt, dsk.bsk_ntt_sh, abar.T), length=n
    )
    return acc


def keyswitch(dsk: DeviceServerKey, big_lwe: jax.Array) -> jax.Array:
    """Big-LWE [G, kN+1] -> small-LWE [G, n+1] via int8-limb MXU matmul."""
    p = dsk.params
    kn = p.big_n
    a, b = big_lwe[:, :kn], big_lwe[:, kn]
    digits = ops.signed_decompose(jnp, a, p.ks_base_log, p.ks_level)
    # [l, G, kN] -> [G, kN*l] with row order i*l + j (matches gen_ksk)
    d = jnp.transpose(digits, (1, 2, 0)).reshape(a.shape[0], kn * p.ks_level)
    d8 = d.astype(jnp.int8)
    acc = None
    for limb in range(4):
        part = jax.lax.dot_general(
            d8,
            dsk.ksk_limbs[limb],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        term = part.astype(jnp.uint32) << (8 * limb)
        acc = term if acc is None else acc + term
    out = jnp.uint32(0) - acc
    return out.at[:, p.n].add(b)


def bootstrap(
    dsk: DeviceServerKey, lwe_in: jax.Array, testv: jax.Array
) -> jax.Array:
    """Full PBS: blind rotate -> sample extract -> keyswitch. [G,n+1]->[G,n+1]."""
    acc = blind_rotate(dsk, lwe_in, testv)
    big = ops.sample_extract(jnp, acc, dsk.params.k, dsk.params.N)
    return keyswitch(dsk, big)


# ----------------------------------------------------------------------
# Test polynomials
# ----------------------------------------------------------------------


def gates_test_poly(params: TfheParams) -> np.ndarray:
    """Constant q/8 poly: blind rotation yields +-q/8 (the sign bootstrap)."""
    return np.full((1, params.N), np.uint32(1 << 29), dtype=np.uint32)


def lut_test_poly(params: TfheParams, table: np.ndarray) -> np.ndarray:
    """Programmable test poly from f-values over the padded message space.

    table: uint64 [..., msg_space/2] of f(m) values (m has a padding bit, so
    only msg_space/2 inputs are reachable). Returns uint32 [..., N].
    """
    p = params
    half_space = p.msg_space // 2
    box = p.N // half_space
    vals = (np.asarray(table, dtype=np.uint64) % p.msg_space) * p.delta
    v = np.repeat(vals.astype(np.uint32), box, axis=-1)  # [..., N]
    # negacyclic rotate by -box/2 so each box is centered on its phase
    h = box // 2
    lead = v[..., h:]
    wrap = (0 - v[..., :h].astype(np.int64)) % (1 << 32)
    return np.concatenate([lead, wrap.astype(np.uint32)], axis=-1)
