"""Persistent XLA compilation cache for every helm_tpu entry point.

The remote (axon-tunneled) TPU compiler takes ~2.5 min per distinct PBS
batch shape; the JAX persistent cache stores the serialized executable so
repeat runs (CLI, serving daemon, benches, tools) skip compilation
entirely. The reference has no analogous subsystem — tfhe-rs has no
compile step — so this is TPU-native infrastructure, not parity
(SURVEY.md §5 config/flag system is the nearest neighbour).

Default location: `<repo>/.jax_cache` (shared with bench.py so the
headline bench and the CLI reuse each other's executables). Override with
HELM_TPU_COMPILE_CACHE=<dir>, disable with HELM_TPU_COMPILE_CACHE="".
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
_enabled = [False]


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `path` (idempotent).

    Returns the cache dir in effect, or None when disabled via env.
    Safe to call before or after JAX backend initialization — the cache
    config is consulted at each compile, not at backend init.
    """
    if path is None:
        path = os.environ.get("HELM_TPU_COMPILE_CACHE", _DEFAULT)
    if not path:
        return None
    if _enabled[0]:
        return path
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _enabled[0] = True
    return path
