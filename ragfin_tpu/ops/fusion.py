"""On-device hybrid score fusion (T4).

Device merge of vector top-k results with graph-matched chunk rows,
replicating ``FinancialHybridRAG.hybrid_query_simple``'s host-side merge
semantics (``graph_cons.py:268-342``): vector results first in score order,
then graph-only hits (graph hits carry score 1.0), deduplicated by chunk id —
expressed as one priority-ranked ``lax.top_k`` so the merge runs on device
next to the search kernels instead of in a Python loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_VEC_BASE = 1.0e6  # vector block outranks graph block (reference: vector first)
_GRAPH_BASE = 1.0e3


@functools.partial(jax.jit, static_argnames=("k_out",))
def fuse_results(
    vec_ids: jax.Array,  # [Q, Kv] int32 corpus rows (may include -1 padding)
    graph_rows: jax.Array,  # [G] int32 corpus rows of graph hits (-1 padding)
    k_out: int,
):
    """Returns (fused_rows [Q, k_out] int32, origin [Q, k_out] int32).

    origin: 0 = vector hit, 1 = graph-only hit, -1 = empty slot.
    Order: all valid vector hits (original order), then graph hits not
    already present (graph order).
    """
    q, kv = vec_ids.shape
    g = graph_rows.shape[0]

    vec_valid = vec_ids >= 0
    vec_priority = jnp.where(
        vec_valid, _VEC_BASE - jnp.arange(kv, dtype=jnp.float32)[None, :], -jnp.inf
    )  # [Q, Kv]

    graph_b = jnp.broadcast_to(graph_rows[None, :], (q, g))
    dup = (vec_ids[:, :, None] == graph_b[:, None, :]) & vec_valid[:, :, None]
    dup = jnp.any(dup, axis=1)  # [Q, G]
    # Dedup within graph_rows too (keep the first occurrence) — the
    # docstring promises dedup by chunk id, not just graph-vs-vector.
    same = graph_rows[None, :] == graph_rows[:, None]  # [G, G]
    earlier = jnp.tril(same, k=-1).any(axis=1)  # row repeats an earlier one
    graph_valid = (graph_b >= 0) & ~dup & ~earlier[None, :]
    graph_priority = jnp.where(
        graph_valid, _GRAPH_BASE - jnp.arange(g, dtype=jnp.float32)[None, :], -jnp.inf
    )

    all_ids = jnp.concatenate([vec_ids, graph_b], axis=1)
    all_priority = jnp.concatenate([vec_priority, graph_priority], axis=1)
    all_origin = jnp.concatenate(
        [jnp.zeros((q, kv), jnp.int32), jnp.ones((q, g), jnp.int32)], axis=1
    )

    k = min(k_out, all_ids.shape[1])
    top_p, sel = jax.lax.top_k(all_priority, k)
    fused = jnp.take_along_axis(all_ids, sel, axis=1)
    origin = jnp.take_along_axis(all_origin, sel, axis=1)
    empty = ~jnp.isfinite(top_p)
    return jnp.where(empty, -1, fused), jnp.where(empty, -1, origin)
