# TMO=2400
BENCH_MEDIAN_N=2 python -u bench.py
