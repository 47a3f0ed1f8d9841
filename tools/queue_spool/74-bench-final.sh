# TMO=3600
BENCH_MEDIAN_N=5 python -u bench.py
