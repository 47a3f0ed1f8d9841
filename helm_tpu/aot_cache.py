"""Persistent AOT executable cache for Mosaic (Pallas/MXU) programs.

The axon TPU plugin's built-in persistent compilation cache never stores
executables containing Mosaic custom calls (ROADMAP #3: an identical
bench rerun paid the full ~480 s compile, and the cache logged zero
get/put attempts for the fs kernel). PJRT itself CAN serialize those
executables: `jax.experimental.serialize_executable` round-trips a
compiled Mosaic program exactly (tools/aot_probe.py, verified on-chip
2026-08-19). This module builds the missing cache on top of that:

    step = cached_jit(fn, static_argnums=..., donate_argnums=...)
    step(*args)   # 1st process ever: compile (~minutes), serialize to disk
                  # later processes:  trace (~seconds), deserialize (<10 s)

`cached_jit` behaves like `jax.jit` with an extra dispatch layer: per
process it memoizes the loaded executable by (static argvals, dynamic
arg pytree structure, leaf shapes/dtypes); across processes it keys disk
entries by a hash of the lowered StableHLO text + jax/runtime versions,
so any change to the traced program, the compiler, or the device kind
misses cleanly. On the CPU backend (tests, oracle runs) it degrades to
plain `jax.jit` — compiles there are fast and jax's own cache works.

The reference has no analogous subsystem (tfhe-rs has no compile step);
this is TPU-native infrastructure around SURVEY.md §5's config system.
"""

from __future__ import annotations

import hashlib
import os
import re
import struct
import threading
import time
import warnings

import jax

# process-wide stats, readable by tests and bench logging
stats = {"hits": 0, "misses": 0, "stores": 0, "errors": 0}

MIN_STORE_SECS = [5.0]  # don't persist executables that compile faster

#: tests flip this to exercise the serialize/deserialize path on CPU,
#: where compiles are fast and the cache normally degrades to plain jit
FORCE = [False]

# StableHLO location metadata: inline loc(...) refs and #locN = loc(...)
# alias lines (source file/line info — semantically irrelevant)
_LOC_RE = re.compile(r"loc\([^\n]*?\)|^#loc.*$", re.MULTILINE)


def _cache_dir() -> str | None:
    """Resolve the AOT cache directory (None = disabled).

    Defaults to `<compile_cache dir>/aot` so the CLI, bench, and serving
    daemon share one location; HELM_TPU_AOT_CACHE overrides, "" disables.
    """
    env = os.environ.get("HELM_TPU_AOT_CACHE")
    if env is not None:
        return _safe_dir(env) if env else None
    from .compile_cache import _DEFAULT, _FALLBACK, _active

    base = _active[0] or _DEFAULT
    for cand in (base, _FALLBACK):
        path = os.path.join(cand, "aot")
        try:
            os.makedirs(path, mode=0o700, exist_ok=True)
        except OSError:
            continue
        safe = _safe_dir(path)
        if safe:
            return safe
    return None


def _safe_dir(path: str) -> str | None:
    """Refuse cache dirs another user could write to.

    Executables deserialize from here; a group/other-writable dir (or one
    owned by someone else) would let another local user substitute a
    validly-framed entry with a different compiled program. Fails open to
    DISABLED (None) with a warning, never to trusting the dir. See
    SECURITY.md "AOT executable cache trust model"."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    if hasattr(os, "geteuid"):  # POSIX: ownership + write bits
        if st.st_uid == os.geteuid() and (st.st_mode & 0o022):
            try:  # ours but loose (e.g. pre-hardening dir): tighten it
                os.chmod(path, st.st_mode & ~0o022)
                st = os.stat(path)
            except OSError:
                pass
        if st.st_uid != os.geteuid() or (st.st_mode & 0o022):
            warnings.warn(
                f"AOT cache dir {path!r} is writable by other users "
                "(or not owned by you); persistent executable cache "
                "DISABLED. chmod go-w / chown it, or point "
                "HELM_TPU_AOT_CACHE at a private directory."
            )
            return None
    return path


# Entry framing: MAGIC + sha256(body) + body, with body =
# u32 n_devices | i64 device_ids[n] | u64 payload_len | payload.
# Deliberately NOT pickle: a writable/shared cache dir must never be an
# arbitrary-code-execution vector (the payload itself is opaque bytes
# handed to PJRT's deserializer). The digest fails corrupt or truncated
# entries closed; pre-format (pickle-era) files fail the magic check and
# are recompiled over. See SECURITY.md "AOT executable cache".
_MAGIC = b"HTPUAOT2\n"


def _pack_entry(payload: bytes, device_ids: list[int]) -> bytes:
    body = (
        struct.pack("<I", len(device_ids))
        + struct.pack(f"<{len(device_ids)}q", *device_ids)
        + struct.pack("<Q", len(payload))
        + payload
    )
    return _MAGIC + hashlib.sha256(body).digest() + body


def _unpack_entry(data: bytes) -> tuple[bytes, list[int]]:
    if not data.startswith(_MAGIC):
        raise ValueError("not an AOT cache entry (bad magic)")
    hoff = len(_MAGIC)
    digest, body = data[hoff : hoff + 32], data[hoff + 32 :]
    if hashlib.sha256(body).digest() != digest:
        raise ValueError("AOT cache entry checksum mismatch")
    n = struct.unpack_from("<I", body, 0)[0]
    ids = list(struct.unpack_from(f"<{n}q", body, 4))
    off = 4 + 8 * n
    plen = struct.unpack_from("<Q", body, off)[0]
    payload = body[off + 8 : off + 8 + plen]
    if len(payload) != plen:
        raise ValueError("AOT cache entry truncated")
    return payload, ids


def _runtime_fingerprint() -> str:
    dev = jax.devices()[0]
    return "|".join(
        (
            jax.__version__,
            dev.client.platform,
            dev.client.platform_version,
            getattr(dev, "device_kind", "?"),
        )
    )


class CachedJit:
    """jax.jit plus a disk-persistent executable cache (see module doc)."""

    def __init__(
        self,
        fn,
        *,
        static_argnums=(),
        static_argnames=(),
        donate_argnums=(),
        name: str | None = None,
    ):
        self.fn = fn
        self.static_argnums = tuple(static_argnums)
        self.static_argnames = tuple(static_argnames)
        self.name = name or getattr(fn, "__name__", "fn")
        self._jit = jax.jit(
            fn,
            static_argnums=self.static_argnums,
            static_argnames=self.static_argnames,
            donate_argnums=tuple(donate_argnums),
        )
        self._memo: dict = {}
        self._lock = threading.Lock()

    # -- signature handling ------------------------------------------------
    def _split(self, args, kwargs):
        statics = tuple(args[i] for i in self.static_argnums) + tuple(
            kwargs[k] for k in self.static_argnames if k in kwargs
        )
        dyn_args = tuple(
            a for i, a in enumerate(args) if i not in self.static_argnums
        )
        dyn_kwargs = {
            k: v for k, v in kwargs.items() if k not in self.static_argnames
        }
        return statics, dyn_args, dyn_kwargs

    def _sig(self, args, kwargs):
        statics, dyn_args, dyn_kwargs = self._split(args, kwargs)
        leaves, treedef = jax.tree_util.tree_flatten((dyn_args, dyn_kwargs))
        avals = tuple(
            (getattr(x, "shape", ()), str(getattr(x, "dtype", type(x).__name__)))
            for x in leaves
        )
        return (statics, treedef, avals)

    # -- compile / load ----------------------------------------------------
    def _load_or_compile(self, args, kwargs, cache_dir):
        from jax.experimental import serialize_executable as se

        lowered = self._jit.lower(*args, **kwargs)
        # strip source-location metadata before hashing: a comment-level
        # edit anywhere on the trace path must not invalidate the cache
        text = _LOC_RE.sub("", lowered.as_text())
        h = hashlib.sha256(
            (text + "\x00" + _runtime_fingerprint()).encode()
        ).hexdigest()[:32]
        path = os.path.join(cache_dir, f"{self.name}-{h}.pjrt")
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload, device_ids = _unpack_entry(f.read())
                # the executable must load onto exactly the devices it was
                # compiled for (by id) — passing the full device list makes
                # PJRT treat a 1-device program as N-way sharded
                by_id = {d.id: d for d in jax.devices()}
                exec_devices = [by_id[i] for i in device_ids]
                _, in_tree = jax.tree_util.tree_flatten(lowered.args_info)
                compiled = se.deserialize_and_load(
                    payload,
                    in_tree,
                    lowered.out_tree,
                    execution_devices=exec_devices,
                )
                stats["hits"] += 1
                return compiled
            except Exception as e:  # corrupt/incompatible entry: recompile
                stats["errors"] += 1
                warnings.warn(
                    f"helm_tpu: AOT cache entry {path} unusable ({e}); recompiling"
                )
        t0 = time.perf_counter()
        compiled = lowered.compile()
        dt = time.perf_counter() - t0
        stats["misses"] += 1
        if dt >= MIN_STORE_SECS[0]:
            try:
                payload, _, _ = se.serialize(compiled)
                ids = [
                    d.id
                    for d in compiled._executable.xla_executable.local_devices()
                ]
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(_pack_entry(payload, ids))
                os.replace(tmp, path)
                stats["stores"] += 1
            except Exception as e:  # serialization is best-effort
                stats["errors"] += 1
                warnings.warn(f"helm_tpu: AOT serialize failed ({e}); uncached")
        return compiled

    # -- dispatch ------------------------------------------------------------
    def __call__(self, *args, **kwargs):
        if jax.default_backend() == "cpu" and not FORCE[0]:
            return self._jit(*args, **kwargs)
        cache_dir = _cache_dir()
        if cache_dir is None:
            return self._jit(*args, **kwargs)
        key = self._sig(args, kwargs)
        compiled = self._memo.get(key)
        if compiled is None:
            with self._lock:
                compiled = self._memo.get(key)
                if compiled is None:
                    compiled = self._load_or_compile(args, kwargs, cache_dir)
                    self._memo[key] = compiled
        _, dyn_args, dyn_kwargs = self._split(args, kwargs)
        return compiled(*dyn_args, **dyn_kwargs)


def cached_jit(fn=None, **kw):
    """Decorator/factory: `cached_jit(fn, static_argnums=..., ...)`."""
    if fn is None:
        return lambda f: CachedJit(f, **kw)
    return CachedJit(fn, **kw)
