"""safe_top_k: the TPU TopkEmitter batch-1 crash workaround must be
bit-identical to lax.top_k on both code paths (ops/topk.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.ops.topk import _ROW_THRESHOLD, safe_top_k


def test_safe_top_k_matches_lax_on_workaround_path():
    # batch 1, row long enough to take the broadcast-to-2 path
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, _ROW_THRESHOLD + 13)),
                    jnp.float32)
    s_ref, i_ref = jax.lax.top_k(x, 257)
    s, i = jax.jit(lambda a: safe_top_k(a, 257))(x)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_safe_top_k_matches_lax_on_plain_path():
    rng = np.random.default_rng(1)
    for shape in [(2, _ROW_THRESHOLD + 13), (1, 1024), (5, 333)]:
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        k = min(17, shape[1])
        s_ref, i_ref = jax.lax.top_k(x, k)
        s, i = safe_top_k(x, k)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
