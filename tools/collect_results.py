"""Collect round-3 measurement results from the queue/spool logs.

Parses `... rot/s ...` sweep lines, `RESULT {json}` lines
(family_bench / noise_validate), and AES steady-state lines out of the
log files given as argv (default: the round-3 logs in /tmp), printing a
consolidated JSON document for PERFORMANCE.md / SECURITY.md editing.
"""
import json
import re
import sys

LOGS = sys.argv[1:] or [
    "/tmp/tpu_queue_r3a.log",
    "/tmp/tpu_queue_r3b.log",
    "/tmp/tpu_queue_r3c.log",
    "/tmp/tpu_spool.log",
]

sweeps = []
results = []
aes = []
for path in LOGS:
    try:
        text = open(path).read()
    except OSError:
        continue
    for m in re.finditer(
        r"^(\w+) gt=(\d+) ablate='([^']*)': ([\d.]+) rot/s \(compile ([\d.]+)s\)",
        text,
        re.M,
    ):
        sweeps.append(
            {
                "layout": m.group(1),
                "gt": int(m.group(2)),
                "ablate": m.group(3),
                "rot_s": float(m.group(4)),
                "compile_s": float(m.group(5)),
                "log": path,
            }
        )
    for m in re.finditer(r"^RESULT (\{.*\})$", text, re.M):
        try:
            results.append(json.loads(m.group(1)))
        except json.JSONDecodeError:
            pass
    for m in re.finditer(
        r"AES-128 steady-state: ([\d.]+)s(?: for (\d+) blocks = ([\d.]+)s/block)?"
        r" \((\w+), backend=(\w+)\)",
        text,
    ):
        aes.append(
            {
                "total_s": float(m.group(1)),
                "blocks": int(m.group(2) or 1),
                "s_per_block": float(m.group(3) or m.group(1)),
                "params": m.group(4),
                "backend": m.group(5),
            }
        )

print(json.dumps({"sweeps": sweeps, "results": results, "aes": aes}, indent=1))
