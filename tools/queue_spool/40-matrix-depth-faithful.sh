# TMO=14400
# Re-run the RUNNING.md gates-mode family matrix on the DEPTH-FAITHFUL
# regenerated stand-ins (VERDICT r4 item 3: published ISCAS'85/'89 logic
# depths; previous numbers were measured on circuits 2-4x shallower, so
# both the wall-clocks and the reference bounds move). One process,
# single-vector latency shape, oracle-checked; RESULT lines carry the
# new refbounds.
MODE=gates PSET=GATES_128_K3 BACKEND=mxu NETLISTS="benchmarks/netlists/c880-like.v benchmarks/netlists/c1355-like.v benchmarks/netlists/c1908-like.v benchmarks/netlists/c2670-like.v benchmarks/netlists/c3540-like.v benchmarks/netlists/c5315-like.v benchmarks/netlists/c6288-like.v benchmarks/netlists/c7552-like.v benchmarks/netlists/s386-like.v:0:3 benchmarks/netlists/s1488-like.v:0:3 benchmarks/netlists/s15850-like.v:0:2" python -u tools/family_bench.py
