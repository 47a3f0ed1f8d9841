"""ctypes binding to the native data loader (native/loader.cpp).

CSV test-vector parsing and threaded batch LWE encryption in C++ for giant
batched-serving vector sets; falls back to the Python csv_io / numpy
encrypt path transparently when the shared library has not been built
(`make -C native`). Both paths produce semantically identical results
(identical CSV expansion; encryption differs only in randomness — see
tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB = None
_LIB_TRIED = False

_SO_PATHS = [
    Path(os.environ["HELM_TPU_NATIVE_LOADER"])
    if os.environ.get("HELM_TPU_NATIVE_LOADER")
    else None,
    Path(__file__).resolve().parents[2] / "native" / "libhelm_loader.so",
]


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    for p in _SO_PATHS:
        if p and p.exists():
            try:
                lib = ctypes.CDLL(str(p))
            except OSError:  # wrong arch / corrupt build: keep the fallback
                continue
            lib.helm_read_input_csv.restype = ctypes.c_void_p
            lib.helm_read_input_csv.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.helm_loader_free.argtypes = [ctypes.c_void_p]
            lib.helm_encrypt_lwe.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),  # key
                ctypes.c_int,  # n
                ctypes.POINTER(ctypes.c_uint32),  # mu
                ctypes.c_long,  # m
                ctypes.c_double,  # noise_std
                ctypes.c_char_p,  # key32 (256-bit ChaCha20 key)
                ctypes.c_int,  # nthreads
                ctypes.POINTER(ctypes.c_uint32),  # out
            ]
            _LIB = lib
            break
    return _LIB


def native_available() -> bool:
    return _load() is not None


def read_input_wires(file_name: str, ptxt_type: str) -> dict:
    """Same contract as io/csv_io.read_input_wires, parsed in C++."""
    lib = _load()
    if lib is None:
        from . import csv_io

        return csv_io.read_input_wires(file_name, ptxt_type)
    is_bool = 1 if ptxt_type == "bool" else 0
    ptr = lib.helm_read_input_csv(file_name.encode(), is_bool)
    if not ptr:
        raise ValueError(f"unreadable or malformed input CSV: {file_name}")
    try:
        text = ctypes.string_at(ptr).decode()
    finally:
        lib.helm_loader_free(ptr)
    out: dict = {}
    for line in text.splitlines():
        name, _, val = line.partition("=")
        out[name] = bool(int(val)) if is_bool else int(val)
    return out


def _key32(seed) -> bytes:
    """Normalize a seed (int or bytes) to a 256-bit ChaCha20 key."""
    if isinstance(seed, (bytes, bytearray)) and len(seed) == 32:
        return bytes(seed)
    import hashlib

    if isinstance(seed, int):
        seed = seed.to_bytes(32, "little", signed=False)
    return hashlib.sha256(b"helm_tpu-native-enc-v1:" + bytes(seed)).digest()


def encrypt_batch(
    key: np.ndarray,
    mu: np.ndarray,
    noise_std: float,
    seed,
    nthreads: int = 0,
) -> np.ndarray:
    """Batch LWE encryption of torus messages mu (uint32 [...]) under key
    (uint32 [n]): returns uint32 [..., n+1]. All cores by default. `seed`
    is 32 bytes of key material (or an int, hashed to 32 bytes); both the
    C++ path and the Python fallback draw masks and noise from ChaCha20
    streams keyed by it. The C++ path assigns one stream per fixed
    1024-row block, so a given (seed, mu) yields the same ciphertexts for
    EVERY nthreads value (and any batch-size threshold). The Python
    fallback's stream layout differs from C++ (single stream, numpy draw
    order) but is likewise independent of threading."""
    lib = _load()
    n = int(key.shape[0])
    if lib is None:
        from ..fhe.csprng import ChaChaGenerator

        rng = ChaChaGenerator(_key32(seed))
        mu32 = np.asarray(mu, dtype=np.uint32)
        a = rng.integers(0, 1 << 32, size=mu32.shape + (n,), dtype=np.uint32)
        dot = (a.astype(np.uint64) * key.astype(np.uint64)).sum(axis=-1)
        e = np.rint(rng.normal(0.0, noise_std, size=mu32.shape)).astype(
            np.int64
        ) if noise_std > 0 else np.zeros(mu32.shape, np.int64)
        with np.errstate(over="ignore"):
            b = (dot.astype(np.uint32) + mu32 + (e % (1 << 32)).astype(np.uint32))
        return np.concatenate([a, b[..., None].astype(np.uint32)], axis=-1)
    shape = mu.shape
    mu_flat = np.ascontiguousarray(mu.reshape(-1), dtype=np.uint32)
    key = np.ascontiguousarray(key, dtype=np.uint32)
    m = mu_flat.shape[0]
    out = np.empty((m, n + 1), dtype=np.uint32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.helm_encrypt_lwe(
        key.ctypes.data_as(u32p),
        n,
        mu_flat.ctypes.data_as(u32p),
        m,
        float(noise_std),
        _key32(seed),
        nthreads,
        out.ctypes.data_as(u32p),
    )
    return out.reshape(*shape, n + 1)
