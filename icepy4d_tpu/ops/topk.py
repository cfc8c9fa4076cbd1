"""top_k with a TPU-compiler crash workaround.

Measured on the v5e toolchain in this image (libtpu via the axon
remote-compile helper): `jax.lax.top_k` on a BATCH-1 operand with a
large non-power-of-2 row length SIGABRTs the compiler —
`pipeline_emitter.cc:2741 Check failed: operand.span_size.RawSize() > 0`
inside TopkEmitter::EmitBatchForWindowedR2. Reproduced at
(1, 376752|442704|442752) x k=4096 (128-aligned or not); the SAME rows
at batch 2, power-of-2 rows at batch 1, and k=1024/8192 all compile.
The trigger is therefore the batch-1 windowed-R2 emitter path, and the
cheapest reliable escape is to present the operand at batch 2.

`safe_top_k` broadcasts batch-1 operands to batch 2 above a row-length
threshold and slices the result back. The broadcast is free in HBM
(XLA keeps it an access pattern); the duplicated sort work is
milliseconds at these sizes and only exists on the batch-1 path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# rows longer than this on a batch-1 operand take the workaround.
# Crashes were observed from ~376k; power-of-2 rows at 131072 were
# fine, but the emitter heuristics are opaque — be conservative.
_ROW_THRESHOLD = 1 << 17


def top2_last(x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(best, second, argmax) along the last axis via two max passes.

    The Lowe-ratio matchers only ever need k=2, but a generic
    `lax.top_k` lowers to the TPU sort/TopkEmitter path — a large HLO
    whose remote compile time (and crash surface, see module docstring)
    is wasted on k=2. Two fused max/argmax reductions over the (already
    materialized) similarity matrix compile to a fraction of the
    program and read it once more at most.

    Duplicate maxima behave like lax.top_k: only the first occurrence
    is masked for the second pass, so `second == best` when the row's
    maximum appears twice.
    """
    a1 = jnp.argmax(x, axis=-1)
    s1 = jnp.take_along_axis(x, a1[..., None], -1)[..., 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    neg = (jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    s2 = jnp.max(jnp.where(cols == a1[..., None], neg, x), axis=-1)
    return s1, s2, a1


def safe_top_k(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """`lax.top_k` over the last axis of a 2-D (B, N) operand, avoiding
    the batch-1 TPU TopkEmitter crash (see module docstring)."""
    b, n = x.shape
    if b == 1 and n >= _ROW_THRESHOLD:
        s, i = jax.lax.top_k(jnp.broadcast_to(x, (2, n)), k)
        return s[:1], i[:1]
    return jax.lax.top_k(x, k)
