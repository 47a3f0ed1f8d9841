#!/usr/bin/env python3
"""Benchmark: gate bootstraps/sec/chip at production gates-mode parameters.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Default parameter set: GATES_128_K3 — the ≥100-bit-core-SVP (≈128-bit
lattice-estimator-equivalent) gates family, i.e. the same security class
as the reference's flagship CPU gates mode (tfhe-rs boolean defaults,
reference src/bin/helm.rs:241). BENCH_PARAMS=GATES_TPU_MB2 benches the
reference-GPU-mirroring weak set (src/bin/helm.rs:141-146) instead;
PERFORMANCE.md records both.

Baseline anchor: the reference evaluates gates with tfhe-rs CPU gate
bootstraps (~10 ms each single-threaded on a server core; rayon-parallel
across cores — reference circuit.rs:531). The repo publishes no numbers
and Rust/network are unavailable in this image to measure it, so the
anchor is a documented estimate generous to the baseline: 64 cores x
~100 bootstraps/s = 6400 bootstraps/s at PERFECT scaling on a large host.
tools/baseline_cpu/ pins the full reproduction recipe (tfhe-rs 0.4.1,
the reference's exact hot loop) that replaces this with a measurement on
any host with Rust + network — see BASELINE.md "Anchor status".
"""

import json
import os
import sys
import time

HELM_CPU_BASELINE_BS_PER_SEC = 6400.0

# last successful on-chip measurement, persisted so a flaky tunnel at
# capture time still yields an (explicitly stale-marked) number
LAST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_last.json")


def _probe_backend() -> bool:
    """Probe TPU reachability with retries + backoff.

    One 300 s probe timeout lost round 2's entire capture to a transient
    tunnel outage; now we make BENCH_PROBE_RETRIES (default 6) probes of
    BENCH_PROBE_TIMEOUT (default 120 s) each, sleeping 30/60/90/... s in
    between — ~15 min of patience total by default."""
    import subprocess

    retries = int(os.environ.get("BENCH_PROBE_RETRIES", "6"))
    tmo = float(os.environ.get("BENCH_PROBE_TIMEOUT", "120"))
    for i in range(1, retries + 1):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=tmo,
                check=True,
                capture_output=True,
            )
            return True
        except Exception as e:
            print(
                f"[bench] TPU probe {i}/{retries} failed: {type(e).__name__}",
                file=sys.stderr,
            )
            if i < retries:
                time.sleep(min(30 * i, 120))
    return False


def _capture_conditions(wait_s: float = 900.0) -> dict:
    """Detect (and try to avoid) concurrent TPU/CPU load during capture.

    The round-4 driver capture (2959.88 bs/s) regressed ~10% below a
    same-day controlled capture (3280.04) with nothing in the artifact
    identifying why. The known contention source is the measurement spool
    runner (tools/tpu_spool.sh — shares the single TPU chip and the 4
    vCPUs): if it is live with work queued/running, wait up to `wait_s`
    for it to drain, then record whatever is still running in the
    artifact so every number carries its capture conditions."""
    base = os.path.dirname(os.path.abspath(__file__))
    spool = os.path.join(base, "tools", "queue_spool")
    pidf = os.path.join(spool, ".runner.pid")

    def _runner_alive() -> bool:
        try:
            with open(pidf) as f:
                pid = int(f.read().strip())
            os.kill(pid, 0)
            return True
        except Exception:
            return False

    def _spool_busy() -> bool:
        try:
            queued = [n for n in os.listdir(spool) if n.endswith(".sh")]
        except OSError:
            queued = []
        return _runner_alive() and bool(queued)

    def _runner_is_ancestor() -> bool:
        # when bench itself is a spool item, the still-queued item is us —
        # waiting would deadlock for the full timeout
        try:
            with open(pidf) as f:
                rpid = int(f.read().strip())
        except Exception:
            return False
        pid = os.getpid()
        for _ in range(30):
            if pid == rpid:
                return True
            try:
                with open(f"/proc/{pid}/stat") as f:
                    pid = int(f.read().split(")")[-1].split()[1])
            except (OSError, ValueError, IndexError):
                return False
            if pid <= 1:
                return False
        return False

    if _runner_is_ancestor():
        wait_s = 0.0
    waited = 0.0
    while _spool_busy() and waited < wait_s:
        if waited == 0.0:
            print(
                "[bench] spool runner busy — waiting for the queue to "
                f"drain (up to {wait_s:.0f}s)",
                file=sys.stderr,
            )
        time.sleep(15)
        waited += 15.0
    # other python processes competing for the 4 vCPUs / the chip
    others = []
    me = os.getpid()
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().replace(b"\0", b" ").decode(errors="replace").strip()
            except OSError:
                continue
            first = cmd.split(" ", 1)[0]
            if (
                ("python" in first or first in ("timeout", "env"))
                and "python" in cmd
                and any(k in cmd for k in ("helm_tpu", "tools/", "pytest", "bench"))
            ):
                others.append(cmd[:120])
    except OSError:
        pass
    others = others[:8]
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    cond = {
        "spool_runner_live": _runner_alive(),
        "spool_busy": _spool_busy(),
        "waited_for_spool_s": round(waited, 1),
        "concurrent_python": others,
        "load_avg_1m": load1,
    }
    if cond["spool_busy"] or others:
        print(f"[bench] CONTENTION at capture: {cond}", file=sys.stderr)
    return cond


def _fail_with_stale(reason: str) -> int:
    out = {
        "metric": "gate_bootstraps_per_sec_per_chip",
        "value": None,
        "unit": "bootstraps/s",
        "vs_baseline": None,
        "error": reason,
    }
    try:
        with open(LAST_PATH) as f:
            out["last_measurement"] = json.load(f)  # has measured_at + stale
    except Exception:
        pass
    print(json.dumps(out))
    return 1


def _bench_circuit_latency(p, ck, sk, backend):
    """c880-like single-vector wall-clock vs the analytic reference bounds.

    Reuses the bench keys (same parameter set); evaluates the fused-level
    program once for compile + median-of-3 timed runs, oracle-checked."""
    import numpy as np

    from helm_tpu.circuit.graph import Circuit
    from helm_tpu.circuit.verilog import read_verilog_file
    from helm_tpu.engines.boolean import BooleanEngine
    from helm_tpu.refbound import level_bootstrap_profile, reference_bounds

    path = os.environ.get("BENCH_NETLIST", "benchmarks/netlists/c880-like.v")
    nl = read_verilog_file(path)
    eng = BooleanEngine(
        mode="gates", params=p, backend=backend, keys=(ck, sk)
    )
    eng.compile(nl)
    rng = np.random.default_rng(11)
    inputs = {w: bool(rng.integers(0, 2)) for w in sorted(nl.inputs)}
    wires = eng.evaluate(eng.encrypt_inputs(inputs))
    np.asarray(wires)  # compile + warmup
    times = []
    for _ in range(5):
        w0 = eng.encrypt_inputs(inputs)
        t0 = time.perf_counter()
        w0 = eng.evaluate(w0)
        np.asarray(w0)
        times.append(time.perf_counter() - t0)
        wires = w0
    c = Circuit.from_netlist(read_verilog_file(path))
    exp = c.evaluate(c.initialize_wire_map(nl.wire_set, inputs))
    got = eng.decrypt_outputs(wires)
    assert all(got[w] == bool(exp[w]) for w in got), "circuit outputs wrong"
    rb = reference_bounds(level_bootstrap_profile(c))
    value = float(np.median(times))
    import pathlib

    print(json.dumps({
        "metric": f"{pathlib.Path(path).stem}_wall_clock_per_vector",
        "value": round(value, 4),
        "unit": "s",
        # >1 = faster than an infinite-core reference host on one vector
        "vs_baseline": round(rb["infinite_core_floor_s"] / value, 3),
        "ref_infinite_core_floor_s": rb["infinite_core_floor_s"],
        "ref_core_bound_s": rb["core_bound_s"],
        "ref_cores": rb["cores"],
        "ref_bootstraps": rb["bootstraps"],
        "bounds_model": "10ms/bootstrap; levels sequential (circuit.rs:524)",
        "windows": [round(t, 4) for t in times],
    }))


def main():
    # fail fast (but patiently) if the TPU backend is unreachable — a hung
    # axon init otherwise stalls the whole bench run for its full timeout
    if not _probe_backend():
        return _fail_with_stale("TPU backend unreachable after retries")

    # serialize with (or at least record) concurrent measurement load —
    # BENCH_WAIT_IDLE=0 disables the wait, conditions are always recorded
    cond = _capture_conditions(float(os.environ.get("BENCH_WAIT_IDLE", "900")))

    import numpy as np

    import jax

    # persistent compilation cache: repeat runs skip the ~2-minute compile
    from helm_tpu.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from helm_tpu import params as P
    from helm_tpu.fhe import lwe, pbs_jnp
    from helm_tpu.fhe.server_key import gen_server_key

    G = int(os.environ.get("BENCH_BATCH", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    backend = os.environ.get("BENCH_BACKEND", "mxu")  # jnp | pallas | mxu
    # default: the ≥100-bit-secure k=3 multi-bit gates set on the
    # frequency-in-sublanes MXU kernel (see module docstring)
    p = getattr(P, os.environ.get("BENCH_PARAMS", "GATES_128_K3"))

    t = time.perf_counter()
    # multibit keygen takes minutes; it is deterministic in (params, seed),
    # so cache the keys across bench runs (BENCH_KEY_CACHE="" disables)
    cache = os.environ.get("BENCH_KEY_CACHE", "/tmp")
    ckp = os.path.join(cache, f"bench_ck_{p.name}_s2024.npz") if cache else ""
    skp = os.path.join(cache, f"bench_sk_{p.name}_s2024.npz") if cache else ""
    ck = sk = None
    if skp and os.path.exists(ckp) and os.path.exists(skp):
        from helm_tpu.fhe import keys as K

        try:
            ck = K.load_client_key(ckp)
            sk = K.load_server_key(skp)
            print("[bench] keys loaded from cache", file=sys.stderr)
        except ValueError as e:  # CRT prime set changed: regenerate
            print(f"[bench] key cache invalid ({e})", file=sys.stderr)
    if sk is None:
        ck = lwe.keygen(p, seed=2024)
        sk = gen_server_key(ck)
        if skp:
            from helm_tpu.fhe import keys as K

            K.save_client_key(ckp, ck)
            K.save_server_key(skp, sk)
    print(f"[bench] keygen {time.perf_counter()-t:.1f}s", file=sys.stderr)
    t = time.perf_counter()
    dsk = pbs_jnp.DeviceServerKey.from_host(sk)
    jax.block_until_ready(dsk.bsk_ntt)
    print(f"[bench] key transfer {time.perf_counter()-t:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    bits1 = rng.integers(0, 2, G).astype(bool)
    bits2 = rng.integers(0, 2, G).astype(bool)
    lin = (lwe.encrypt(ck, lwe.encode_bool(bits1)) + lwe.encrypt(ck, lwe.encode_bool(bits2))).astype(np.uint32)
    lin[:, p.n] += np.uint32((-(1 << 29)) % (1 << 32))
    testv = jnp.asarray(pbs_jnp.gates_test_poly(p))
    x = jnp.asarray(lin)

    if backend == "pallas":
        from helm_tpu.aot_cache import cached_jit
        from helm_tpu.ops.pallas_pbs import bootstrap_pallas

        bs = cached_jit(
            lambda dsk, x, tv: bootstrap_pallas(dsk, x, tv), name="bench_pallas"
        )
    elif backend == "mxu":
        from helm_tpu.ops.mxu_pbs import bootstrap_mxu_aot

        # precompute the MXU key layout outside the trace (id-keyed cache
        # cannot see through tracers)
        dsk = dsk.with_mxu_keys()

        def bs(dsk, x, tv):
            return bootstrap_mxu_aot(dsk, x, tv)
    else:
        bs = jax.jit(pbs_jnp.bootstrap)
    t = time.perf_counter()
    out = bs(dsk, x, testv)
    np.asarray(out)  # compile + warmup
    print(f"[bench] compile+warmup {time.perf_counter()-t:.1f}s", file=sys.stderr)

    # correctness spot check before timing
    got = lwe.decode_bool(lwe.decrypt_phase(ck, np.asarray(out)))
    exp = bits1 & bits2
    assert (got == exp).all(), "bootstrap outputs wrong — not benchmarking a broken kernel"

    # median of N timing windows (not best-run): the recorded run-to-run
    # drift band at GATES_128_K3 is ~±10%, so a single window (and
    # especially a best-of) overstates reproducible throughput
    nwin = max(1, int(os.environ.get("BENCH_MEDIAN_N", "5")))
    rates = []
    for w in range(nwin):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = bs(dsk, x, testv)
        np.asarray(out)  # force materialization (block_until_ready can be
        # a no-op on the tunneled platform)
        dt = time.perf_counter() - t0
        rates.append(G * iters / dt)
        print(f"[bench] window {w+1}/{nwin}: {rates[-1]:.1f} bs/s", file=sys.stderr)

    # Second metric (printed BEFORE the primary so the primary stays the
    # last line): per-circuit wall-clock vs the analytic reference bounds
    # from the level profile (helm_tpu/refbound.py) — a comparison that
    # does not depend on the 6400 bs/s throughput estimate. The floor is
    # unreachable by ANY core count (levels are strictly sequential in
    # the reference, src/circuit.rs:524-548).
    if os.environ.get("BENCH_CIRCUIT", "1") != "0":
        try:
            _bench_circuit_latency(p, ck, sk, backend)
        except AssertionError:
            # an ORACLE failure means we are benchmarking wrong outputs —
            # that must sink the whole run, not print a healthy headline
            # (round-4 verdict, weak item 7a)
            raise
        except Exception as e:  # infrastructure-only shield for metric 2
            print(f"[bench] circuit metric failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    value = float(np.median(rates))
    rec = {
        "metric": "gate_bootstraps_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "bootstraps/s",
        "vs_baseline": round(value / HELM_CPU_BASELINE_BS_PER_SEC, 3),
        "median_of": nwin,
        "windows": [round(r, 1) for r in rates],
        "capture": cond,
    }
    try:  # persist for the stale-fallback path; never let this fail a run
        with open(LAST_PATH, "w") as f:
            json.dump(
                {**rec, "stale": True, "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())},
                f,
            )
    except Exception:
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.exit(main())
