"""Int8 corpus quantization for the vector index (pallas_guide quantization
pattern applied to retrieval).

The exact-search cost at 10M chunks is one full corpus read per query batch;
int8 storage cuts that HBM traffic 4× vs f32 (2× vs bf16) and lets the MXU
run int8×int8 with int32 accumulation. Scheme: symmetric per-chunk (per
corpus column) absmax scaling, and per-query-row scaling for the query side:

    score[i, j] ≈ (q_i8[i] · c_i8[:, j]) * q_scale[i] * c_scale[j]

Ranking error is bounded by the ~0.4% per-element rounding; on unit-norm
embeddings top-k id agreement with f32 is near-perfect (tested in
tests/test_topk.py::TestInt8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def quantize_corpus_t(corpus_t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[D, N] f32/bf16 → (int8 [D, N], scales f32 [1, N]) per-column absmax."""
    x = corpus_t.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=0, keepdims=True)  # [1, N]
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


@jax.jit
def quantize_queries(queries: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[Q, D] f32 → (int8 [Q, D], scales f32 [Q, 1]) per-row absmax."""
    x = queries.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)
