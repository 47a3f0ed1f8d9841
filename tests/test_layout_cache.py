"""The BSK layout memo must survive CPython id() reuse (key rotation).

ADVICE r2: keying a process-global dict by bare id(bsk_ntt) without
retaining the array means a later server key whose bsk_ntt lands on the
recycled id would silently get the previous key's layout. The cache now
validates a weakref to the source on every hit and evicts on collection.
"""

import gc

import jax.numpy as jnp

from helm_tpu.ops.mxu_pbs import _layout_cache, _mxu_key_cache


def test_layout_cache_hit_and_rotation():
    calls = []
    x = jnp.arange(8, dtype=jnp.float32)

    v1 = _layout_cache("t_rot", x, lambda: calls.append(1) or "layout-x")
    v2 = _layout_cache("t_rot", x, lambda: calls.append(1) or "SHOULD-MEMO")
    assert v1 == v2 == "layout-x" and len(calls) == 1

    del x
    gc.collect()
    # dead entry evicted; a new array (possibly on the recycled id) rebuilds
    assert not any(k[0] == "t_rot" for k in _mxu_key_cache())
    y = jnp.arange(8, dtype=jnp.float32)
    v3 = _layout_cache("t_rot", y, lambda: calls.append(1) or "layout-y")
    assert v3 == "layout-y" and len(calls) == 2


def test_layout_cache_mismatched_source_rebuilds():
    """Even with a live entry, a different source object never hits."""
    a = jnp.zeros(4)
    b = jnp.ones(4)
    va = _layout_cache("t_mm", a, lambda: "A")
    vb = _layout_cache("t_mm", b, lambda: "B")
    assert va == "A" and vb == "B"
