"""safe_top_k: the TPU TopkEmitter batch-1 crash workaround must be
bit-identical to lax.top_k on both code paths (ops/topk.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.ops.topk import _ROW_THRESHOLD, safe_top_k, top2_last


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


def test_top2_last_matches_lax_top_k():
    rng = np.random.default_rng(2)
    for shape in [(3, 7, 129), (2, 64), (1, 1, 5)]:
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        s_ref, i_ref = jax.lax.top_k(x, 2)
        s1, s2, a1 = jax.jit(top2_last)(x)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s_ref[..., 0]))
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(s_ref[..., 1]))
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(i_ref[..., 0]))


def test_top2_last_duplicate_maxima():
    # the row maximum appears twice: second must equal best (top_k parity)
    x = jnp.asarray([[1.0, 5.0, 5.0, 3.0], [2.0, 2.0, 1.0, 0.0]])
    s1, s2, a1 = top2_last(x)
    np.testing.assert_array_equal(np.asarray(s1), [5.0, 2.0])
    np.testing.assert_array_equal(np.asarray(s2), [5.0, 2.0])
    np.testing.assert_array_equal(np.asarray(a1), [1, 0])
