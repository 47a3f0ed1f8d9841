"""Subprocess body for test_sharded_arith_matches_oracle.

Runs the sharded-arith oracle check in a FRESH process. Rationale
(round-4 segfault chase): the full default suite twice crashed inside
XLA:CPU's native `backend_compile_and_load` while compiling this test's
pjit program ~45 min into the run (faulthandler dump pinned the frame;
see PERFORMANCE.md "Crash mechanisms") — the same program compiles and
passes clean in a fresh process every time. The trigger is accumulated
in-process compiler state across the suite's hundreds of prior
compilations, not this program. Isolating the suite's heaviest
mesh-compile into a subprocess keeps the coverage and removes the
suite-killing crash.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from helm_tpu import params as P  # noqa: E402
from helm_tpu.circuit.graph import Circuit  # noqa: E402
from helm_tpu.circuit.verilog import read_verilog_file  # noqa: E402
from helm_tpu.engines.arith import ArithEngine  # noqa: E402
from helm_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding,
    make_gate_mesh,
    replicated,
)


def main() -> int:
    nl = read_verilog_file("benchmarks/netlists/chi_squared_arith.v", True)
    e = ArithEngine("u8", params=P.TEST_PARAMS_ARITH, seed=44)
    mesh = make_gate_mesh(4)
    e.set_sharding(batch_sharding(mesh), replicated(mesh))
    try:
        e.compile(nl)
        inputs = {"n0": 3, "n1": 5, "n2": 7}
        out = e.decrypt_outputs(e.evaluate(e.encrypt_inputs(inputs)))
        c = Circuit.from_netlist(
            read_verilog_file("benchmarks/netlists/chi_squared_arith.v", True)
        )
        exp = c.evaluate_arith(
            c.initialize_wire_map(nl.wire_set, inputs, default=0), 8
        )
        for w in ("alpha", "beta1", "beta2", "beta3"):
            assert out[w] == exp[w], (w, out[w], exp[w])
    finally:
        from helm_tpu.engines import radix

        radix.BATCH_SHARD[0] = None
    print("SHARDED_ARITH_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
