"""Persistent XLA compilation cache for every helm_tpu entry point.

The remote (axon-tunneled) TPU compiler takes ~2.5 min per distinct PBS
batch shape; the JAX persistent cache stores the serialized executable so
repeat runs (CLI, serving daemon, benches, tools) skip compilation
entirely. The reference has no analogous subsystem — tfhe-rs has no
compile step — so this is TPU-native infrastructure, not parity
(SURVEY.md §5 config/flag system is the nearest neighbour).

Default location: `<repo>/.jax_cache` (shared with bench.py so the
headline bench and the CLI reuse each other's executables), falling back
to `~/.cache/helm_tpu/jax_cache` when that is unwritable (pip installs
land the package beside site-packages). Override with
HELM_TPU_COMPILE_CACHE=<dir>, disable with HELM_TPU_COMPILE_CACHE="".
"""

from __future__ import annotations

import os
import warnings

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
_FALLBACK = os.path.join(
    os.path.expanduser("~"), ".cache", "helm_tpu", "jax_cache"
)
_active: list[str | None] = [None]
_enabled = [False]


def _apply(path: str) -> str:
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _active[0] = path
    _enabled[0] = True
    return path


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `path`.

    Returns the cache dir actually in effect (which may differ from the
    request when the requested dir is unwritable), or None when disabled
    via env or when no writable location exists. Idempotent: a repeat
    call with the same (or no) path is a no-op; a repeat call with a
    *different* path re-points the cache. Safe to call before or after
    JAX backend initialization — the cache config is consulted at each
    compile, not at backend init.
    """
    explicit = path is not None
    if path is None:
        path = os.environ.get("HELM_TPU_COMPILE_CACHE", _DEFAULT)
    if not path:
        return None
    if _enabled[0] and path == _active[0]:
        return _active[0]
    try:
        return _apply(path)
    except OSError as e:
        if not explicit and path == _DEFAULT:
            try:
                return _apply(_FALLBACK)
            except OSError:
                pass
        warnings.warn(
            f"helm_tpu: compilation cache dir {path!r} unusable ({e}); "
            "running uncached"
        )
        return _active[0]
