"""Worker process for tests/test_multihost.py (not a test module).

Runs one process of a 2-process jax.distributed run: 4 virtual CPU devices
per process, global 8-device mesh, gates-mode sharded evaluation of the
2-bit adder. Prints one JSON line with the decrypted outputs so the parent
can assert cross-process agreement with the oracle.

Usage: python _multihost_worker.py <coordinator> <num_processes> <process_id> [mode]
mode: "gates" (default) or "arith" (chi-squared u8 via the dataflow
scheduler, radix PBS batches sharded over the global mesh).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "gates"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from helm_tpu import params as P
    from helm_tpu.circuit.graph import Circuit
    from helm_tpu.circuit.verilog import read_verilog_file
    from helm_tpu.parallel import distributed, mesh

    distributed.init_multihost(coordinator, nproc, pid)
    assert len(jax.devices()) == 4 * nproc, "global mesh must span all processes"
    assert len(jax.local_devices()) == 4
    m = mesh.make_gate_mesh()

    # identical seed on every process -> identical (replicated) ciphertexts
    if mode == "gates":
        from helm_tpu.engines.boolean import BooleanEngine

        nl = read_verilog_file("benchmarks/netlists/2-bit-adder.v")
        inputs = {
            "a[0]": True, "a[1]": False, "b[0]": True, "b[1]": True,
            "cin": True,
        }
        e = BooleanEngine(mode="gates", params=P.TEST_PARAMS, seed=13)
        e.set_sharding(mesh.batch_sharding(m), mesh.replicated(m))
        e.compile(nl)
        out = e.decrypt_outputs(e.evaluate(e.encrypt_inputs(inputs)))
        c = Circuit.from_netlist(nl)
        exp = c.evaluate(c.initialize_wire_map(nl.wire_set, inputs))
        ok = all(bool(exp[w]) == bool(v) for w, v in out.items())
        outputs = {k: bool(v) for k, v in sorted(out.items())}
    else:
        from helm_tpu.engines.arith import ArithEngine

        nl = read_verilog_file("benchmarks/netlists/chi_squared_arith.v", True)
        inputs = {"n0": 3, "n1": 5, "n2": 7}
        e = ArithEngine("u8", params=P.TEST_PARAMS_ARITH, seed=44)
        e.set_sharding(mesh.batch_sharding(m), mesh.replicated(m))
        e.compile(nl)
        out = e.decrypt_outputs(e.evaluate(e.encrypt_inputs(inputs)))
        c = Circuit.from_netlist(nl)
        exp = c.evaluate_arith(
            c.initialize_wire_map(nl.wire_set, inputs, default=0), 8
        )
        keys = ("alpha", "beta1", "beta2", "beta3")
        ok = all(int(out[w]) == int(exp[w]) for w in keys)
        outputs = {w: int(out[w]) for w in keys}

    print(
        "MULTIHOST_RESULT "
        + json.dumps(
            {
                "pid": pid,
                "devices": len(jax.devices()),
                "oracle_ok": ok,
                "outputs": outputs,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
