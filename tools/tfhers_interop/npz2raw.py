#!/usr/bin/env python3
"""Convert the .npz interchange (helm_tpu/io/tfhers_interop.py) <-> the
flat .raw layout the Rust side reads/writes (see src/main.rs header doc).

  python npz2raw.py export.npz helm_export.raw     # npz -> raw (+key)
  python npz2raw.py tfhers_export.raw import.npz   # raw -> npz
"""
import sys

import numpy as np


def npz_to_raw(src: str, dst: str) -> None:
    z = np.load(src, allow_pickle=False)
    v, n, qlog, msl = (int(x) for x in z["header"])
    cts = z["cts"].astype("<u4")
    with open(dst, "wb") as f:
        for h in (v, n, qlog, msl, cts.shape[0]):
            f.write(np.int64(h).tobytes())
        f.write(cts.tobytes())
        if "key" in z:
            f.write(z["key"].astype("<u4").tobytes())
    print(f"{dst}: n={n}, {cts.shape[0]} cts, key={'key' in z}")


def raw_to_npz(src: str, dst: str) -> None:
    raw = open(src, "rb").read()
    hdr = np.frombuffer(raw[:40], dtype="<i8")
    v, n, qlog, msl, m = (int(x) for x in hdr)
    words = np.frombuffer(raw[40:], dtype="<u4")
    cts = words[: m * (n + 1)].reshape(m, n + 1)
    rest = words[m * (n + 1):]
    payload = {
        "header": np.array([v, n, qlog, msl], dtype=np.int64),
        "cts": cts,
    }
    if rest.size == n:
        payload["key"] = rest
    np.savez(dst, **payload)
    print(f"{dst}: n={n}, {m} cts, key={rest.size == n}")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    (npz_to_raw if src.endswith(".npz") else raw_to_npz)(src, dst)
