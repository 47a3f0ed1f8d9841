"""Arithmetic-mode engine: radix integers over behavioral netlists.

Counterpart of the reference's ArithCircuit (src/circuit.rs:1113-1483):
wires carry encrypted u8..u128 radix integers; gates are add/sub/mult/div/
shl/shr/copy with ciphertext (x) ciphertext and ciphertext (x) plaintext
variants (numeric-literal wire names are plaintext operands,
circuit.rs:1330-1334). Combinational only, like the reference
(src/bin/helm.rs:33-36).

Per level, gates are grouped by op kind and each group executes as batched
radix ops (engines/radix.py) — the TPU analog of the reference's
per-gate-type grouping in its CUDA engine.

Positional note: the reference always computes `ct OP pt` regardless of the
literal's position (circuit.rs:1337-1361); we evaluate positionally
(`5 - x` means 5-x) by trivially encrypting the literal, which matches the
plaintext oracle.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..circuit.gates import GateType
from ..circuit.graph import Circuit, _is_numeric
from ..circuit.verilog import Netlist
from ..fhe import lwe, pbs_jnp
from ..fhe.server_key import gen_server_key
from ..params import ARITH_PARAMS, TfheParams
from .radix import WIDTH_BLOCKS, RadixOps, trivial_blocks


class ArithEngine:
    def __init__(
        self, ptxt_type: str, params: TfheParams | None = None, seed=None
    ):
        assert ptxt_type in WIDTH_BLOCKS, ptxt_type
        self.ptxt_type = ptxt_type
        self.nb = WIDTH_BLOCKS[ptxt_type]
        self.width = 2 * self.nb
        self.params = params or ARITH_PARAMS
        self.client_key = lwe.keygen(self.params, seed)
        self.dsk = pbs_jnp.DeviceServerKey.from_host(gen_server_key(self.client_key))
        from .radix import BACKEND

        if BACKEND[0] == "mxu":
            # precompute the MXU BSK layout so jitted radix ops (e.g. the
            # propagate loop) don't re-derive it on device every launch
            self.dsk = self.dsk.with_mxu_keys()
        self.ops = RadixOps(self.params, self.dsk)
        self.plan = None

    def set_sharding(self, batch_shard, repl_shard) -> None:
        """Shard every radix PBS batch across the mesh (parallel/mesh.py)."""
        from . import radix

        radix.BATCH_SHARD[0] = batch_shard

    def compile(self, netlist: Netlist) -> None:
        circuit = Circuit(
            netlist.gates, netlist.inputs, netlist.outputs, netlist.dff_outputs
        )
        circuit.sort_circuit()
        circuit.compute_levels()
        wires = sorted(
            set(netlist.wire_set) | set(netlist.inputs) | set(netlist.dff_outputs)
        )
        self.wire_index = {w: i for i, w in enumerate(wires)}
        self.circuit = circuit
        self.netlist = netlist

    # -- client role ---------------------------------------------------
    def _encrypt_value(self, value: int) -> np.ndarray:
        blocks = [(value >> (2 * i)) & 3 for i in range(self.nb)]
        return lwe.encrypt(
            self.client_key, lwe.encode_msg(self.params, np.array(blocks))
        )

    def encrypt_inputs(self, input_wire_map: dict | list) -> jax.Array:
        """Wire table [W, V, nb, n+1]; V > 1 = batched serving (a list of
        input maps evaluated together — every radix launch is V× wider,
        amortizing the per-launch blind-rotation latency floor)."""
        p = self.params
        maps = (
            input_wire_map
            if isinstance(input_wire_map, list)
            else [input_wire_map]
        )
        W, V = len(self.wire_index), len(maps)
        wires = np.zeros((W, V, self.nb, p.n + 1), dtype=np.uint32)
        dff = set(self.netlist.dff_outputs)
        for vi, m in enumerate(maps):
            dummy = not m or "dummy" in m
            for w in self.circuit.input_wires:
                if w in dff:
                    continue
                if dummy:
                    val = 0
                elif w not in m:
                    raise KeyError(
                        f'Input wire "{w}" not found in input wires!'
                    )
                else:
                    val = int(m[w])
                wires[self.wire_index[w], vi] = self._encrypt_value(val)
            for w in dff:
                wires[self.wire_index[w], vi] = self._encrypt_value(0)
        return jnp.asarray(wires)

    # -- evaluation ----------------------------------------------------
    def evaluate(self, wires: jax.Array, verbose: bool = False) -> jax.Array:
        ops = self.ops
        levels = self.circuit.levels
        V = wires.shape[1]
        n1 = self.params.n + 1

        def flat(a):  # [G, V, nb, n+1] -> [G*V, nb, n+1] op batch
            return a.reshape(a.shape[0] * V, self.nb, n1)

        def unflat(a):
            return a.reshape(a.shape[0] // V, V, self.nb, n1)

        for li, (_, gates) in enumerate(levels):
            groups: dict[GateType, list] = {}
            for g in gates:
                groups.setdefault(g.type, []).append(g)
            adds = groups.pop(GateType.ADD, [])
            subs = groups.pop(GateType.SUB, [])
            if adds and subs:
                # fuse the level's adds and subs into one propagate launch
                gs = adds + subs
                B = len(gs)
                x = jnp.stack([self._opnd(wires, g.inputs[0], B) for g in gs])
                y = jnp.stack([self._opnd(wires, g.inputs[1], B) for g in gs])
                is_sub = [False] * len(adds) + [True] * len(subs)
                res = unflat(
                    ops.add_sub_mixed(
                        flat(x), flat(y), [s for s in is_sub for _ in range(V)]
                    )
                )
                dst = jnp.asarray(
                    [self.wire_index[g.output] for g in gs], dtype=jnp.int32
                )
                wires = wires.at[dst].set(res)
            elif adds:
                groups[GateType.ADD] = adds
            elif subs:
                groups[GateType.SUB] = subs
            for t, gs in groups.items():
                if t == GateType.COPY:
                    src = jnp.asarray(
                        [self.wire_index[g.inputs[0]] for g in gs], dtype=jnp.int32
                    )
                    dst = jnp.asarray(
                        [self.wire_index[g.output] for g in gs], dtype=jnp.int32
                    )
                    wires = wires.at[dst].set(wires[src])
                    continue
                if t == GateType.MULT:
                    # ct (x) pt multiplies (numeric-literal operand on
                    # either side — mult commutes) take the cheap
                    # binary-expansion path; power-of-two constants are
                    # pure block relabels with no bootstraps at all
                    plain = [
                        g
                        for g in gs
                        if _is_numeric(g.inputs[0]) != _is_numeric(g.inputs[1])
                    ]
                    if plain:
                        gs = [g for g in gs if g not in plain]
                        byc: dict[int, list] = {}
                        for g in plain:
                            ci, xi = (
                                (0, 1) if _is_numeric(g.inputs[0]) else (1, 0)
                            )
                            byc.setdefault(int(g.inputs[ci]), []).append(
                                (g, xi)
                            )
                        for cval, items in byc.items():
                            x = jnp.stack(
                                [
                                    wires[self.wire_index[g.inputs[xi]]]
                                    for g, xi in items
                                ]
                            )
                            res = unflat(ops.mul_plain(flat(x), cval))
                            dst = jnp.asarray(
                                [self.wire_index[g.output] for g, _ in items],
                                dtype=jnp.int32,
                            )
                            wires = wires.at[dst].set(res)
                        if not gs:
                            continue
                B = len(gs)
                xs = [self._opnd(wires, g.inputs[0], B) for g in gs]
                ys = [self._opnd(wires, g.inputs[1], B) for g in gs]
                x = flat(jnp.stack(xs))
                if t in (GateType.SHL, GateType.SHR):
                    # plain amounts take the cheap relabel path
                    amounts = [
                        int(g.inputs[1]) if _is_numeric(g.inputs[1]) else None
                        for g in gs
                    ]
                    if all(a is not None for a in amounts):
                        res = ops.shift_plain_many(
                            x,
                            [a for a in amounts for _ in range(V)],
                            t == GateType.SHL,
                        )
                    else:
                        y = flat(jnp.stack(ys))
                        res = ops.shift_ct(x, y, t == GateType.SHL)
                else:
                    y = flat(jnp.stack(ys))
                    if t == GateType.ADD:
                        res = ops.add(x, y)
                    elif t == GateType.SUB:
                        res = ops.sub(x, y)
                    elif t == GateType.MULT:
                        res = ops.mul(x, y)
                    elif t == GateType.DIV:
                        res = ops.div(x, y)
                    else:
                        raise ValueError(f"unsupported arith gate {t}")
                res = unflat(res)
                dst = jnp.asarray(
                    [self.wire_index[g.output] for g in gs], dtype=jnp.int32
                )
                wires = wires.at[dst].set(res)
            if verbose:
                print(f"  Evaluated gates in level [{li + 1}/{len(levels)}]")
        return wires

    def _opnd(self, wires, name: str, batch: int):
        """One gate operand: [V, nb, n+1] (V = serving batch)."""
        if _is_numeric(name):
            return trivial_blocks(
                self.params, int(name), self.nb, wires.shape[1]
            )
        return wires[self.wire_index[name]]

    # -- decryption ----------------------------------------------------
    def _decrypt_value(self, ct_blocks: np.ndarray) -> int:
        ph = lwe.decrypt_phase(self.client_key, ct_blocks)
        msgs = lwe.decode_msg(self.params, ph) % 4
        return int(sum(int(m) << (2 * i) for i, m in enumerate(msgs)))

    def decrypt_outputs(self, wires: jax.Array) -> dict | list:
        """dict for single-vector runs; list of dicts for batched serving."""
        host = np.asarray(wires)
        outs = [
            {
                w: self._decrypt_value(host[self.wire_index[w], vi])
                for w in self.circuit.output_wires
            }
            for vi in range(host.shape[1])
        ]
        return outs[0] if len(outs) == 1 else outs

    def decrypt_all_wires(self, wires: jax.Array) -> dict | list:
        host = np.asarray(wires)
        outs = [
            {
                w: self._decrypt_value(host[i, vi])
                for w, i in self.wire_index.items()
            }
            for vi in range(host.shape[1])
        ]
        return outs[0] if len(outs) == 1 else outs
