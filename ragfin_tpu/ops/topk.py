"""Exact cosine top-k over an HBM-resident embedding matrix.

TPU-native replacement for the reference's Milvus IVF_FLAT COSINE search
(``chunking_storing (1).py:29``, ``retrieve.py:28-34``). Exact flat search —
strictly better recall than IVF at the same memory — in three tiers:

- :func:`cosine_topk_dense`   — one matmul + ``lax.top_k``; correctness
  reference, materializes the full [Q, N] score matrix.
- :func:`cosine_topk_blocked` — ``lax.scan`` over corpus blocks with a
  running top-k merge; memory-bounded (never holds more than [Q, block]
  scores), pure XLA, works on any backend.
- :func:`cosine_topk_fused`   — Pallas kernel fusing the tiled score matmul
  with on-chip k-selection: scores never leave VMEM, HBM traffic is exactly
  one read of the corpus matrix (the speed-of-light bound for exact search).

The corpus is passed **transposed** as ``corpus_t [D, N]`` — the layout the
MXU wants for ``q @ corpus_t`` — so no kernel ever pays a VMEM relayout
(:class:`ragfin_tpu.index.vector_index.DeviceVectorIndex` stores this layout).

All tiers return ``(scores [Q,k] f32 desc, ids [Q,k] int32)`` and agree
exactly under HIGHEST precision (ties broken by lower id). Inputs are assumed
L2-normalized (cosine == dot); pass ``n_valid`` to mask padded corpus columns.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
_INT_MAX = 0x7FFFFFFF

# Merge-loop variant for the fused kernels: "invariant" closes over the
# score tile (_stream_merge); "maxlazy" defers id extraction into the while
# body (_stream_merge_maxlazy); "carry" threads a masked copy through the
# while loop; "mask" extracts candidates in id order from a hit bitmask
# (_stream_merge_mask) with an invariant-merge seed on tile 0. Env override
# for A/B probes on hardware; unset → the measured-winner per-shape default
# (_default_variant).
_MERGE_VARIANT = os.environ.get("RAGFIN_MERGE_VARIANT") or None
_MERGE_INVARIANT = _MERGE_VARIANT != "carry"

# Merge slice width (see _merge_tile_sliced): the [TQ, TN] score tile is
# merged in column slices of this width so each while-loop iteration touches
# TN/slice VPU lanes instead of the whole tile, and slices that cannot
# improve the running top-k cost one row-max + compare. 0 disables slicing
# (whole-tile merge). MEASURED ON TPU: slicing regresses (8.42 vs 5.62
# ms/batch at Q=64/1M — the per-slice branch + guard overhead exceeds the
# narrower passes), so the default is off; kept for probes.
_MERGE_SLICE = int(os.environ.get("RAGFIN_MERGE_SLICE", "0"))

_PRECISIONS = {
    "exact": jax.lax.Precision.HIGHEST,  # f32-accurate (multi-pass on MXU)
    "fast": jax.lax.Precision.DEFAULT,  # single-pass bf16 inputs
}


def _score_mask(
    scores: jax.Array,
    n_valid,
    row_mask: Optional[jax.Array] = None,
    score_mult: Optional[jax.Array] = None,
) -> jax.Array:
    n = scores.shape[-1]
    if score_mult is not None:
        # Per-column score weighting (integrity-weighted retrieval,
        # retrieval/consistency.py): positive similarities are scaled by the
        # column's multiplier in (0, 1]; negatives are left alone — shrinking
        # a negative score toward 0 would RAISE it past unweighted columns.
        m = score_mult[:n][None, :].astype(scores.dtype)
        scores = jnp.where(scores > 0, scores * m, scores)
    if n_valid is not None and not (isinstance(n_valid, int) and n_valid >= n):
        ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
        scores = jnp.where(ids < n_valid, scores, NEG_INF)
    if row_mask is not None:
        scores = jnp.where(row_mask[: n][None, :], scores, NEG_INF)
    return scores


def _limit(n_valid, n: int):
    """Effective valid-column count; works for None, Python int, or a traced
    scalar (the sharded path passes a per-shard count derived from
    ``lax.axis_index``, so this must not require a static value)."""
    if n_valid is None:
        return n
    if isinstance(n_valid, int):
        return min(n_valid, n)
    return jnp.minimum(jnp.asarray(n_valid, jnp.int32), n)


@functools.partial(jax.jit, static_argnames=("k", "precision"))
def cosine_topk_dense(
    queries: jax.Array,
    corpus_t: jax.Array,
    k: int,
    n_valid: Optional[int] = None,
    precision: str = "exact",
    row_mask: Optional[jax.Array] = None,
    score_mult: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Reference implementation: full [Q, N] scores then ``lax.top_k``.

    ``row_mask`` [N] bool enables metadata-filtered search (the Milvus
    filter-expression capability, e.g. restrict to one period/chunk_type).
    ``score_mult`` [N] float scales positive similarities per column BEFORE
    selection (integrity-weighted retrieval) — XLA fuses it into the matmul
    epilogue, so tampered near-duplicates lose at candidate-generation time
    rather than needing an oversized host re-rank shortlist.
    """
    scores = jnp.dot(
        queries,
        corpus_t.astype(queries.dtype),
        preferred_element_type=jnp.float32,
        precision=_PRECISIONS[precision],
    )
    scores = _score_mask(scores, n_valid, row_mask, score_mult)
    top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_scores, top_ids.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "precision"))
def cosine_topk_dense_multi(
    queries: jax.Array,
    corpus_t: jax.Array,
    k: int,
    row_masks: jax.Array,  # [G, N] bool — one mask per filter tier
    n_valid: Optional[int] = None,
    precision: str = "exact",
    score_mult: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """All of a query group's filter tiers in ONE device program.

    The tiered FilteredSearch pipeline issues one masked search per tier
    (company ∧ period ∧ type, then company ∧ period, ...) — 2-4 dispatches
    per query, each paying a host→device round trip (~40-80 ms through the
    axon tunnel). Here the [Q, N] score matrix is computed ONCE and every
    tier's mask + top-k selection reuses it on device, returning
    ([G, Q, k] scores, [G, Q, k] ids) from a single dispatch.
    """
    scores = jnp.dot(
        queries,
        corpus_t.astype(queries.dtype),
        preferred_element_type=jnp.float32,
        precision=_PRECISIONS[precision],
    )
    scores = _score_mask(scores, n_valid, None, score_mult)

    def per_tier(mask):
        masked = jnp.where(mask[: scores.shape[-1]][None, :], scores, NEG_INF)
        s, i = jax.lax.top_k(masked, k)
        return s, i.astype(jnp.int32)

    return jax.vmap(per_tier)(row_masks)


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk_dense_multi_int8(
    queries: jax.Array,
    corpus_i8: jax.Array,
    scales: jax.Array,
    k: int,
    row_masks: jax.Array,
    n_valid=None,
    score_mult: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Int8 variant of :func:`cosine_topk_dense_multi` (scores the quantized
    corpus without dequantizing it in HBM)."""
    from .quantize import quantize_queries

    q8, qscale = quantize_queries(queries)
    int_scores = jax.lax.dot_general(
        q8, corpus_i8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    scores = int_scores.astype(jnp.float32) * qscale * scales
    scores = _score_mask(scores, n_valid, None, score_mult)

    def per_tier(mask):
        masked = jnp.where(mask[: scores.shape[-1]][None, :], scores, NEG_INF)
        s, i = jax.lax.top_k(masked, k)
        return s, i.astype(jnp.int32)

    return jax.vmap(per_tier)(row_masks)


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk_dense_int8(
    queries: jax.Array,
    corpus_i8: jax.Array,
    scales: jax.Array,
    k: int,
    n_valid=None,
    row_mask: Optional[jax.Array] = None,
    score_mult: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Dense scoring over the int8 corpus WITHOUT dequantizing it in HBM:
    int8×int8 MXU matmul with int32 accumulation, per-column dequant of the
    [Q, N] score matrix only. Used for metadata-filtered search on quantized
    indexes (the fused int8 kernel has no row-mask input; materializing a
    f32 copy of a 1M-chunk corpus per filtered query would be 1.5 GB)."""
    from .quantize import quantize_queries

    q8, qscale = quantize_queries(queries)
    int_scores = jax.lax.dot_general(
        q8, corpus_i8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    scores = int_scores.astype(jnp.float32) * qscale * scales
    scores = _score_mask(scores, n_valid, row_mask, score_mult)
    top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_scores, top_ids.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "block", "precision"))
def cosine_topk_blocked(
    queries: jax.Array,
    corpus_t: jax.Array,
    k: int,
    block: int = 131072,
    n_valid: Optional[int] = None,
    precision: str = "exact",
) -> tuple[jax.Array, jax.Array]:
    """Memory-bounded exact top-k: scan over corpus column-blocks.

    Peak live memory is [Q, block] scores + the [Q, 2k] merge buffer,
    independent of N — the blockwise-computation idea applied to retrieval
    scoring (SURVEY.md §5).
    """
    q = queries.shape[0]
    d, n = corpus_t.shape
    block = min(block, n)
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    ct = jnp.pad(corpus_t, ((0, 0), (0, pad))) if pad else corpus_t
    limit = _limit(n_valid, n)

    def step(carry, blk_idx):
        run_scores, run_ids = carry
        blk = jax.lax.dynamic_slice(ct, (0, blk_idx * block), (d, block))
        scores = jnp.dot(
            queries,
            blk.astype(queries.dtype),
            preferred_element_type=jnp.float32,
            precision=_PRECISIONS[precision],
        )
        local_ids = blk_idx * block + jax.lax.broadcasted_iota(jnp.int32, (q, block), 1)
        scores = jnp.where(local_ids < limit, scores, NEG_INF)
        s, i = jax.lax.top_k(scores, min(k, block))
        ids = jnp.take_along_axis(local_ids, i, axis=1)
        cat_s = jnp.concatenate([run_scores, s], axis=1)
        cat_i = jnp.concatenate([run_ids, ids], axis=1)
        new_s, sel = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, sel, axis=1)
        return (new_s, new_i), None

    init = (jnp.full((q, k), NEG_INF), jnp.full((q, k), jnp.int32(_INT_MAX)))
    (scores, ids), _ = jax.lax.scan(step, init, jnp.arange(n_blocks, dtype=jnp.int32))
    return scores, ids.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Fused Pallas kernel
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("block_n",))
def tile_corpus_t(corpus_t: jax.Array, block_n: int = 2048) -> jax.Array:
    """Repack ``corpus_t [D, N]`` into the tile-major HBM layout
    ``[n_tiles, D, block_n]`` consumed by the tiled fused kernels.

    In the flat ``[D, N]`` layout a kernel block of ``block_n`` columns is
    D separate strided reads of ``block_n * itemsize`` bytes each (row
    stride = N * itemsize, ~2 MB at 1M chunks) — HBM efficiency collapses to
    ~35% of peak. Tile-major makes every corpus-block DMA one fully
    contiguous ``D * block_n * itemsize`` read (1.5 MB for bf16), which is
    what the speed-of-light estimate in BENCH_NOTES.md assumes. One-time
    device-side repack at index build/load; padded columns are zero (callers
    pass ``n_valid`` exactly as for the flat layout)."""
    d, n = corpus_t.shape
    pad = -n % block_n
    if pad:
        corpus_t = jnp.pad(corpus_t, ((0, 0), (0, pad)))
    n_tiles = corpus_t.shape[1] // block_n
    return jnp.transpose(jnp.reshape(corpus_t, (d, n_tiles, block_n)), (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("block_n",))
def tile_scales(scales: jax.Array, block_n: int = 2048) -> jax.Array:
    """Repack int8 per-column ``scales [1, N]`` to ``[n_tiles, 1, block_n]``
    (tile-major, matching :func:`tile_corpus_t`)."""
    _, n = scales.shape
    pad = -n % block_n
    if pad:
        scales = jnp.pad(scales, ((0, 0), (0, pad)))
    n_tiles = scales.shape[1] // block_n
    return jnp.transpose(jnp.reshape(scales, (1, n_tiles, block_n)), (1, 0, 2))


def _sorted_insert(acc_s, acc_i, s, ids, k: int):
    """Insert one (score, id) candidate per row into the sorted-descending
    running top-k, keeping it sorted. Stable: an incumbent with equal score
    and lower id stays ahead of the candidate; insertion past slot k-1 drops
    the candidate (position == k selects no slot). O(k) vector ops — no
    gathers (Mosaic does not lower take_along_axis)."""
    better = (acc_s > s[:, None]) | ((acc_s == s[:, None]) & (acc_i < ids[:, None]))
    pos = jnp.sum(better.astype(jnp.int32), axis=-1, keepdims=True)  # [R, 1]
    slot = jax.lax.broadcasted_iota(jnp.int32, acc_s.shape, 1)
    # Shift-right view: slot t holds acc[t-1] (t=0 never selected below).
    shift_s = jnp.concatenate([acc_s[:, :1], acc_s[:, :-1]], axis=1)
    shift_i = jnp.concatenate([acc_i[:, :1], acc_i[:, :-1]], axis=1)
    new_s = jnp.where(slot == pos, s[:, None], jnp.where(slot < pos, acc_s, shift_s))
    new_i = jnp.where(slot == pos, ids[:, None], jnp.where(slot < pos, acc_i, shift_i))
    return new_s, new_i


def _stream_merge_mask(scores, col0, acc_s, acc_i, k: int):
    """Bitmask first-k extraction merge: candidates = positions whose score
    strictly beats the PRE-TILE kth running score, extracted in ascending
    id order via linear-index min-reductions (the _first_k_kernel trick
    applied to the fused kernel).

    Cost shape vs :func:`_stream_merge`: the unconditional per-tile work is
    ONE compare+where pass to build ``hit_lin`` plus one min-reduction
    (replacing row-max + row-argmax), and each extraction iteration is ~3
    tile passes (position-select, score-select, successor-min) instead of
    the invariant variant's ~6 (two compares, and/where, argmax, max).

    Exactness: the strict ``>`` vs the pre-tile kth is exact for the same
    reason as the tile-order argument — every candidate id in this tile
    exceeds every incumbent id, so an equal-score candidate always loses the
    tie-break. Extracting in ascending id order keeps `_sorted_insert`'s
    stable semantics (an equal-score lower-id incumbent stays ahead).
    Candidates admitted against the pre-tile kth that fall below the
    POST-insertion kth are dropped by `_sorted_insert` (position == k)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    hit_lin = jnp.where(scores > acc_s[:, k - 1][:, None], iota, _INT_MAX)

    def cond(state):
        _, _, nxt = state
        return jnp.any(nxt < _INT_MAX)

    def body(state):
        a_s, a_i, nxt = state
        sel = iota == nxt[:, None]
        s = jnp.max(jnp.where(sel, scores, NEG_INF), axis=-1)
        ids = jnp.where(nxt < _INT_MAX, nxt + col0, _INT_MAX)
        a_s, a_i = _sorted_insert(a_s, a_i, s, ids, k)
        nxt2 = jnp.min(jnp.where(hit_lin > nxt[:, None], hit_lin, _INT_MAX), axis=-1)
        return a_s, a_i, nxt2

    nxt0 = jnp.min(hit_lin, axis=-1)
    new_s, new_i, _ = jax.lax.while_loop(cond, body, (acc_s, acc_i, nxt0))
    return new_s, new_i


def _stream_merge_maxlazy(scores, col0, acc_s, acc_i, k: int):
    """Streaming merge with the cheapest possible per-tile prologue: ONE
    row-max reduction. The argmax (id extraction) moves INSIDE the while
    body — in steady state most (corpus tile, query tile) pairs improve
    nothing, so the loop is never entered and the tile's selection cost is
    max + compare only. Body iterations pay an extra equality+min-iota pass
    versus the invariant variant (id recovered from the score), which is the
    right trade exactly when improvements are rare.

    Tie semantics preserved: equality extraction takes the LOWEST id holding
    the current max (same winner as argmax-first-occurrence), and the
    successor relation is (score desc, id asc) as in the invariant variant.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)

    def cond(state):
        a_s, _, cur_s, _ = state
        return jnp.any(cur_s > a_s[:, k - 1])

    def body(state):
        a_s, a_i, cur_s, prev_i = state
        # Lowest id holding cur_s BEYOND the previously-extracted id —
        # `prev_i` is -1 except while walking a run of exact ties, where it
        # pins the position of the last extraction so each tied id is
        # extracted once in ascending order.
        eq = scores == cur_s[:, None]
        cand = eq & (iota > prev_i[:, None])
        cur_i = jnp.min(jnp.where(cand, iota, _INT_MAX), axis=-1).astype(jnp.int32)
        a_s, a_i = _sorted_insert(a_s, a_i, cur_s, cur_i + col0, k)
        later = (scores < cur_s[:, None]) | (eq & (iota > cur_i[:, None]))
        nxt_s = jnp.max(jnp.where(later, scores, NEG_INF), axis=-1)
        prev_i = jnp.where(nxt_s == cur_s, cur_i, jnp.int32(-1))
        return a_s, a_i, nxt_s, prev_i

    row_max = jnp.max(scores, axis=-1)
    prev0 = jnp.full(row_max.shape, jnp.int32(-1))
    new_s, new_i, _, _ = jax.lax.while_loop(
        cond, body, (acc_s, acc_i, row_max, prev0)
    )
    return new_s, new_i


def _stream_merge(scores, col0, acc_s, acc_i, k: int, invariant: Optional[bool] = None):
    """Merge a [R, TN] score tile into the sorted running top-k.

    One candidate per row per iteration: extract the row max (argmax breaks
    ties toward the lowest id), sorted-insert it, advance, repeat while any
    row can still improve. Expected iterations per tile fall like k/j on
    shuffled corpora (j = tiles seen), so the steady-state tile cost is one
    matmul + one row-max — the HBM-bandwidth speed-of-light. The strict ``>``
    improvement test is exact: global ids grow with the tile index, so a
    later candidate that ties the kth score always loses the tie-break and
    can never belong in the top-k. (This also stops zero-score query pad
    rows from forcing a merge on every tile, which the previous ``>=`` k-pass
    extraction paid for.)

    ``invariant=True`` keeps the score tile loop-INVARIANT: instead of
    masking extracted winners out of a carried copy (a [R, TN] f32 tensor
    flowing through every ``while`` iteration, which Mosaic must keep live
    and which blocks some i1/layout legalizations), each iteration finds the
    successor of the last-extracted candidate in (score desc, id asc) order
    with pure reductions over the original tile."""
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    if invariant is None:
        invariant = _MERGE_INVARIANT

    if invariant:
        def cond(state):
            a_s, _, cur_s, _ = state
            return jnp.any(cur_s > a_s[:, k - 1])

        def body(state):
            a_s, a_i, cur_s, cur_i = state
            a_s, a_i = _sorted_insert(a_s, a_i, cur_s, cur_i + col0, k)
            # Successor of (cur_s, cur_i) in (score desc, id asc) order.
            later = (scores < cur_s[:, None]) | (
                (scores == cur_s[:, None]) & (iota > cur_i[:, None])
            )
            masked = jnp.where(later, scores, NEG_INF)
            nxt_i = jnp.argmax(masked, axis=-1).astype(jnp.int32)
            nxt_s = jnp.max(masked, axis=-1)
            return a_s, a_i, nxt_s, nxt_i

        cur_s = jnp.max(scores, axis=-1)
        cur_i = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        new_s, new_i, _, _ = jax.lax.while_loop(
            cond, body, (acc_s, acc_i, cur_s, cur_i)
        )
        return new_s, new_i

    def cond(state):
        _, a_s, _, row_max = state
        return jnp.any(row_max > a_s[:, k - 1])

    def body(state):
        sc, a_s, a_i, row_max = state
        win = jnp.argmax(sc, axis=-1).astype(jnp.int32)  # first max = lowest id
        ids = win + col0
        a_s, a_i = _sorted_insert(a_s, a_i, row_max, ids, k)
        sc = jnp.where(iota == win[:, None], NEG_INF, sc)
        return sc, a_s, a_i, jnp.max(sc, axis=-1)

    row_max = jnp.max(scores, axis=-1)
    _, new_s, new_i, _ = jax.lax.while_loop(
        cond, body, (scores, acc_s, acc_i, row_max)
    )
    return new_s, new_i


# Sub-block width for the two-level merge (lanes per level-2 slice). Must
# divide block_n; 128-multiples keep dynamic lane slices aligned.
_TWOLEVEL_SUB = int(os.environ.get("RAGFIN_TWOLEVEL_SUB", "128"))
# Probe knobs: how the [TQ, NB] sub-block maxima are built ("reshape" = 3D
# reshape + lane reduce, "concat" = NB single-lane concats), and two
# results-WRONG timing bisects: NOLOOP skips the merge loop to time the
# prologue alone; NOSTAGE skips the staging stores, so the merge loop (if
# not also disabled) reads an UNINITIALIZED buffer — both modes' outputs
# are garbage and exist only to price kernel stages on hardware.
_TWOLEVEL_M = os.environ.get("RAGFIN_TWOLEVEL_M", "reshape")
_TWOLEVEL_NOLOOP = os.environ.get("RAGFIN_TWOLEVEL_NOLOOP", "0") == "1"
_TWOLEVEL_NOSTAGE = os.environ.get("RAGFIN_TWOLEVEL_NOSTAGE", "0") == "1"
# Probe-only: skip the mlazy body's validity guard (results wrong on the
# n_valid boundary tile only) to price the guard.
_MLAZY_NOGUARD = os.environ.get("RAGFIN_MLAZY_NOGUARD", "0") == "1"


def _merge_tile_twolevel(scores, col0, acc_s, acc_i, rows, n_valid, buf, *, k: int, sub: int):
    """Two-level in-tile selection: the only unconditional full-tile work is
    staging the score tile into the block-major scratch ``buf [NB, TQ, sub]``
    plus a per-sub-block max reduction ([TQ, TN] -> [TQ, NB]); the merge loop
    then runs entirely on the 64x-smaller maxima array, extracting candidates
    from one ``sub``-wide score slice per improving sub-block.

    This removes TWO of the invariant merge's four unconditional full-tile
    VPU passes (measured ~1.1 ms each at Q=1024/1M, BENCH_NOTES round 3):

    - the pad-column mask pass: wholly-invalid sub-blocks are masked on the
      [1, NB] maxima row instead (the single boundary sub-block straddling
      ``n_valid`` keeps its unmasked max — possibly a pad-column 0.0 — which
      can only cause one spurious slice visit; exact lane masking happens
      inside the extracted slice);
    - the full-tile argmax prologue (~2 passes): candidate ids are recovered
      inside the ``sub``-wide slice only;

    while the full-tile row-max pass is replaced by the sub-block max (same
    cost, but its result drives the loop) and the scratch staging store is
    the one new pass. Block-major staging exists because Mosaic cannot
    lower a lane-dim ``dynamic_slice`` on values OR refs — but a traced
    scalar index on a ref's LEADING dim lowers fine, so ``buf[b]`` is the
    per-iteration extraction.

    Exactness/tie-breaks: sub-blocks are processed in ascending block order
    (the improving-block scan takes the MINIMUM hit index, and a processed
    block's maxima row is retired), so candidate global ids grow monotonically
    exactly as in the full-tile merge; within a slice :func:`_stream_merge`
    preserves (score desc, id asc) order, and across slices the strict ``>``
    gate against the running kth drops equal-score higher-id candidates.
    Entry frequency is identical to the invariant merge: ``any(m > kth)``
    with m the sub-block maxima is the same predicate as ``any(rowmax >
    kth)``.
    """
    tq, tn = scores.shape
    nb = tn // sub
    if _TWOLEVEL_M == "reshape":
        if not _TWOLEVEL_NOSTAGE:
            for b in range(nb):
                buf[b] = jax.lax.slice_in_dim(scores, b * sub, (b + 1) * sub, axis=1)
        m = jnp.max(jnp.reshape(scores, (tq, nb, sub)), axis=-1)
    else:
        cols = []
        for b in range(nb):
            sl = jax.lax.slice_in_dim(scores, b * sub, (b + 1) * sub, axis=1)
            buf[b] = sl
            cols.append(jnp.max(sl, axis=-1, keepdims=True))
        m = jnp.concatenate(cols, axis=1)  # [TQ, NB] sub-block maxima
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    # Retire wholly-invalid sub-blocks (first global column >= n_valid).
    m = jnp.where(col0 + iota_b * sub < n_valid, m, NEG_INF)
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (tq, sub), 1)

    # Mosaic cannot legalize NESTED while loops (bisected: an inner
    # _stream_merge while inside the block loop fails with an unresolved
    # f32->i32 materialization), so the block walk and the within-block
    # successor walk are FLATTENED into one loop: each iteration inserts one
    # candidate per row and, when the active block is exhausted, retires it
    # and hops to the next improving block in the same iteration.
    def load(b):
        """Masked [TQ, sub] slice of (clamped) block ``b`` + its global col0."""
        bc = jnp.minimum(b, nb - 1)
        sl = buf[bc]
        c0 = col0 + bc * sub
        return jnp.where(c0 + iota_sub < n_valid, sl, NEG_INF), c0

    def first_block(m, kth):
        """Lowest block index whose max improves any row, else _INT_MAX."""
        hit = m > kth[:, None]
        nxt = jnp.min(
            jnp.where(hit, jnp.broadcast_to(iota_b, m.shape), _INT_MAX), axis=-1
        )
        return jnp.min(nxt)

    a_s0, a_i0 = acc_s[rows], acc_i[rows]
    if _TWOLEVEL_NOLOOP:
        # Probe-only (results WRONG): time the prologue without the merge
        # loop — fold m into the accumulator so nothing is dead-code-eliminated.
        acc_s[rows] = jnp.maximum(a_s0, jnp.max(m, axis=-1, keepdims=True))
        return
    b0 = first_block(m, a_s0[:, k - 1])
    sl0, c00 = load(b0)
    cur_s0 = jnp.where(b0 >= nb, NEG_INF, jnp.max(sl0, axis=-1))
    cur_i0 = jnp.argmax(sl0, axis=-1).astype(jnp.int32) + c00

    def cond(state):
        a_s, _, _, _, cur_s, _ = state
        return jnp.any(cur_s > a_s[:, k - 1])

    def body(state):
        a_s, a_i, m, b, cur_s, cur_i = state
        a_s, a_i = _sorted_insert(a_s, a_i, cur_s, cur_i, k)
        kth = a_s[:, k - 1]
        sl, c0 = load(b)
        # Per-row successor of (cur_s, cur_i) within block b in
        # (score desc, id asc) order — same relation as _stream_merge.
        li = (cur_i - c0)[:, None]
        later = (sl < cur_s[:, None]) | ((sl == cur_s[:, None]) & (iota_sub > li))
        masked = jnp.where(later, sl, NEG_INF)
        nxt_s = jnp.max(masked, axis=-1)
        nxt_i = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        # Block exhausted once no row's successor improves: retire it and hop
        # to the next improving block (ascending order keeps global ids
        # monotone, preserving the strict-> tie-break argument).
        blk_done = ~jnp.any(nxt_s > kth)
        m = jnp.where(blk_done & (iota_b == b), NEG_INF, m)
        b2 = jnp.where(blk_done, first_block(m, kth), b)
        sl2, c02 = load(b2)
        fresh_s = jnp.where(b2 >= nb, NEG_INF, jnp.max(sl2, axis=-1))
        fresh_i = jnp.argmax(sl2, axis=-1).astype(jnp.int32) + c02
        cur_s = jnp.where(blk_done, fresh_s, nxt_s)
        cur_i = jnp.where(blk_done, fresh_i, nxt_i + c0)
        return a_s, a_i, m, b2, cur_s, cur_i

    new_s, new_i, *_ = jax.lax.while_loop(
        cond, body, (a_s0, a_i0, m, b0, cur_s0, cur_i0)
    )
    acc_s[rows] = new_s
    acc_i[rows] = new_i


def _merge_tile_mlazy(scores, col0, acc_s, acc_i, rows, n_valid, *, k: int, sub: int):
    """Sub-block-maxima prologue + lazy in-body id extraction: the ONLY
    unconditional full-tile pass is the per-sub-block max reduction
    ([TQ, TN] -> [TQ, TN/sub] via a minor-dim-split reshape, measured ~0.5 ms
    vs ~1.1 ms/full pass at Q=1024/1M); row maxima and pad masking then run
    on the 64x narrower maxima array. Everything else — candidate id
    extraction, the validity guard, successor search — happens INSIDE the
    merge loop, which only runs when some row improves.

    vs the invariant merge's unconditional tax (mask 1 + row-max 1 + argmax
    ~2 full passes): all replaced by the m pass + narrow ops. vs
    ``twolevel``: no staging buffer and no block serialization — every loop
    iteration extracts one candidate per row over the full tile, so rows
    progress in parallel (the twolevel block walk measured 25 ms of
    serialized narrow iterations at Q=1024/1M; this body costs ~1 wide pass
    more per iteration than the invariant body but iterations are as rare).

    Pad handling (exactness): wholly-invalid sub-blocks are retired on the
    [1, NB] maxima row; a boundary sub-block straddling ``n_valid`` may
    inflate its row's max with a pad-column 0.0 — the in-body ``valid``
    guard then yields an empty candidate set (cur_i == INT_MAX), the
    insertion is voided via a NEG_INF score, and the successor search (also
    valid-guarded) recovers the true next score. ``prev_i`` keeps the
    maxlazy tie-run walk, with an extra ``cur_i != INT_MAX`` guard so an
    inflated entry cannot corrupt the run position.
    """
    tq, tn = scores.shape
    nb = tn // sub
    m = jnp.max(jnp.reshape(scores, (tq, nb, sub)), axis=-1)  # [TQ, NB]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    m = jnp.where(col0 + iota_b * sub < n_valid, m, NEG_INF)
    row_max = jnp.max(m, axis=-1)  # [TQ]
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)

    def cond(state):
        a_s, _, cur_s, _ = state
        return jnp.any(cur_s > a_s[:, k - 1])

    def body(state):
        a_s, a_i, cur_s, prev_i = state
        eq = scores == cur_s[:, None]
        if not _MLAZY_NOGUARD:
            eq = eq & ((col0 + iota) < n_valid)
        cand = eq & (iota > prev_i[:, None])
        cur_i = jnp.min(jnp.where(cand, iota, _INT_MAX), axis=-1).astype(jnp.int32)
        # Void the insertion for rows whose candidate set is empty (the
        # inflated-boundary case): NEG_INF scores always land at pos == k.
        s_ins = jnp.where(cur_i == _INT_MAX, NEG_INF, cur_s)
        a_s, a_i = _sorted_insert(a_s, a_i, s_ins, cur_i + col0, k)
        later = (scores < cur_s[:, None]) | (eq & (iota > cur_i[:, None]))
        if not _MLAZY_NOGUARD:
            later = later & ((col0 + iota) < n_valid)
        nxt_s = jnp.max(jnp.where(later, scores, NEG_INF), axis=-1)
        prev_i = jnp.where(
            (nxt_s == cur_s) & (cur_i != _INT_MAX), cur_i, jnp.int32(-1)
        )
        return a_s, a_i, nxt_s, prev_i

    prev0 = jnp.full(row_max.shape, jnp.int32(-1))
    new_s, new_i, _, _ = jax.lax.while_loop(
        cond, body, (acc_s[rows], acc_i[rows], row_max, prev0)
    )
    acc_s[rows] = new_s
    acc_i[rows] = new_i


def _merge_tile_sliced(scores, col0, acc_s, acc_i, rows, *, k: int, slice_n: int):
    """Merge a [TQ, TN] score tile into the running top-k in column slices.

    The streaming merge's VPU cost is per-iteration full-tile passes
    (successor search over TN lanes). Slicing bounds each pass at
    ``slice_n`` lanes, and a slice none of whose row maxima beat the current
    kth score is skipped after one compare — so the steady-state tile cost
    approaches matmul + one row-max pass. Slices are processed left to
    right, so candidate global ids still grow monotonically and the strict
    ``>`` improvement gate keeps exact tie-break semantics (lower id wins).

    Operates on the accumulator refs in place (``rows`` selects this query
    tile's slab); ``pl.when`` with a traced predicate lowers to a branch.
    """
    n = scores.shape[-1]
    kth = acc_s[rows][:, k - 1]
    for s0 in range(0, n, slice_n):
        # Clamp the final slice: slice_in_dim rejects limits past the edge,
        # so a non-divisor slice_n would crash at trace time.
        sl = jax.lax.slice_in_dim(scores, s0, min(s0 + slice_n, n), axis=1)
        m = jnp.max(sl, axis=-1)

        @pl.when(jnp.any(m > kth))
        def _do(sl=sl, s0=s0):
            new_s, new_i = _stream_merge(sl, col0 + s0, acc_s[rows], acc_i[rows], k)
            acc_s[rows] = new_s
            acc_i[rows] = new_i

        # Re-read the (possibly updated) kth score for the next slice guard.
        kth = acc_s[rows][:, k - 1]


def _merge_tile(scores, col0, acc_s, acc_i, rows, j, *, k: int, slice_n: int, variant: str, n_valid=None, buf=None):
    """Dispatch between merge strategies (RAGFIN_MERGE_VARIANT / slice_n).

    ``twolevel`` receives UNMASKED scores plus the ``n_valid`` scalar and
    handles pad-column masking itself at sub-block granularity (see
    :func:`_merge_tile_twolevel`); every other variant expects pre-masked
    scores.

    ``mask`` uses the bitmask first-k extraction for warm tiles but seeds
    tile j==0 with the score-ordered streaming merge — a cold accumulator
    (kth == -inf) would make EVERY position a candidate and degenerate the
    id-ordered extraction into block_n iterations."""
    if variant == "twolevel":
        _merge_tile_twolevel(
            scores, col0, acc_s, acc_i, rows, n_valid, buf, k=k, sub=_TWOLEVEL_SUB
        )
    elif variant == "mlazy":
        _merge_tile_mlazy(
            scores, col0, acc_s, acc_i, rows, n_valid, k=k, sub=_TWOLEVEL_SUB
        )
    elif variant == "mask":
        @pl.when(j == 0)
        def _seed():
            new_s, new_i = _stream_merge(scores, col0, acc_s[rows], acc_i[rows], k)
            acc_s[rows] = new_s
            acc_i[rows] = new_i

        @pl.when(j != 0)
        def _warm():
            new_s, new_i = _stream_merge_mask(scores, col0, acc_s[rows], acc_i[rows], k)
            acc_s[rows] = new_s
            acc_i[rows] = new_i
    elif variant == "maxlazy":
        new_s, new_i = _stream_merge_maxlazy(scores, col0, acc_s[rows], acc_i[rows], k)
        acc_s[rows] = new_s
        acc_i[rows] = new_i
    elif slice_n and slice_n < scores.shape[-1]:
        _merge_tile_sliced(scores, col0, acc_s, acc_i, rows, k=k, slice_n=slice_n)
    else:
        new_s, new_i = _stream_merge(
            scores, col0, acc_s[rows], acc_i[rows], k, invariant=(variant != "carry")
        )
        acc_s[rows] = new_s
        acc_i[rows] = new_i


def _fused_kernel(
    n_valid_ref,
    q_ref,
    ct_ref,
    out_s_ref,
    out_i_ref,
    acc_s,
    acc_i,
    *scratch,
    k: int,
    block_q: int,
    block_n: int,
    precision: str,
    slice_n: int,
    variant: str,
):
    """Grid = (N tiles, Q tiles); **corpus-major**: each corpus column-tile
    is DMA'd from HBM exactly ONCE and scored against every query tile while
    resident in VMEM — total corpus traffic is one read regardless of the
    query count (the query-major layout re-read all N columns per query
    tile: 8x the traffic at Q=1024). Per-query-tile running top-k lives in
    a scratch slab indexed by the query-tile id; the [TQ, TN] score tile is
    consumed on-chip via the streaming merge (:func:`_stream_merge`), so
    steady-state cost is HBM-bandwidth-bound — the speed-of-light for exact
    search."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    rows = pl.ds(i * block_q, block_q)

    @pl.when(j == 0)
    def _init():
        acc_s[rows] = jnp.full((block_q, k), NEG_INF, acc_s.dtype)
        acc_i[rows] = jnp.full((block_q, k), _INT_MAX, acc_i.dtype)

    lhs = q_ref[:]
    # Tile-major corpus blocks arrive as [1, D, TN] (one contiguous HBM DMA);
    # flat [D, N] blocks arrive as [D, TN] (D strided reads — slower).
    rhs = ct_ref[0] if ct_ref.ndim == 3 else ct_ref[:]
    if lhs.dtype != rhs.dtype:
        # Mosaic rejects mixed-dtype matmuls at fp32 contract precision
        # ("Bad rhs type"): unify on the query dtype (exact tier: bf16
        # corpus tile upcast to f32 on-chip — costs a per-tile convert, not
        # 2x HBM traffic; fast tier already bf16-casts queries in the caller).
        rhs = rhs.astype(lhs.dtype)
    scores = jnp.dot(
        lhs,
        rhs,
        preferred_element_type=jnp.float32,
        precision=_PRECISIONS[precision],
    )
    col0 = j * block_n
    if variant not in ("twolevel", "mlazy"):
        # Pad-column masking. A full-tile iota+compare+select is ~3 VPU
        # passes; comparing on a [1, TN] iota row and broadcasting the select
        # along the sublanes costs ~1. (A scalar pl.when branch that skips
        # masking on interior tiles measured SLOWER — the conditional region
        # breaks Mosaic's cross-step pipelining; see probe_results.log v6 vs
        # big.) The twolevel variant masks at sub-block granularity instead —
        # zero full-tile passes.
        iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, scores.shape[-1]), 1)
        valid_row = (col0 + iota_row) < n_valid_ref[0]
        scores = jnp.where(valid_row, scores, NEG_INF)

    _merge_tile(
        scores, col0, acc_s, acc_i, rows, j, k=k, slice_n=slice_n,
        variant=variant, n_valid=n_valid_ref[0],
        buf=scratch[0] if scratch else None,
    )

    @pl.when(j == pl.num_programs(0) - 1)
    def _flush():
        out_s_ref[:] = acc_s[rows]
        out_i_ref[:] = acc_i[rows]


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "block_n", "precision", "interpret", "slice_n", "variant"),
)
def _fused_call(queries, corpus_t, k, n_valid, block_q, block_n, precision, interpret, slice_n, variant):
    q, d = queries.shape
    tiled = corpus_t.ndim == 3  # [n_tiles, D, block_n] tile-major layout
    if tiled:
        if n_valid is None:
            # The true N is unrecoverable from the tiled shape: the layout's
            # zero-pad columns would score 0.0 and outrank negative-score
            # real hits, silently returning ids >= the true corpus size.
            raise ValueError("a tile-major [n_tiles, D, block_n] corpus requires n_valid")
        block_n = corpus_t.shape[2]
        n = corpus_t.shape[0] * block_n
    else:
        n = corpus_t.shape[1]
    limit = _limit(n_valid, n)
    if precision == "fast" and corpus_t.dtype == jnp.bfloat16:
        # Match operand dtypes for a single-pass bf16 MXU matmul: f32 queries
        # against a bf16 corpus would otherwise promote the corpus tile to
        # f32 inside the kernel — a per-tile conversion plus a multi-pass
        # f32 matmul (~6x slower on the MXU). Scores still accumulate f32.
        queries = queries.astype(jnp.bfloat16)

    pad_q = -q % block_q
    pad_n = -n % block_n
    if pad_q:
        queries = jnp.pad(queries, ((0, pad_q), (0, 0)))
    if pad_n and not tiled:
        corpus_t = jnp.pad(corpus_t, ((0, 0), (0, pad_n)))
    qp = queries.shape[0]
    np_ = corpus_t.shape[0] * block_n if tiled else corpus_t.shape[1]

    # Corpus-major grid: j (N tiles) is the slow dimension, i (Q tiles) the
    # fast one, so each corpus tile is read once and reused for all queries.
    grid = (np_ // block_n, qp // block_q)
    kernel = functools.partial(
        _fused_kernel,
        k=k,
        block_q=block_q,
        block_n=block_n,
        precision=precision,
        slice_n=slice_n,
        variant=variant,
    )
    corpus_spec = (
        pl.BlockSpec((1, d, block_n), lambda j, i, *prefetch: (j, 0, 0))
        if tiled
        else pl.BlockSpec((d, block_n), lambda j, i, *prefetch: (0, j))
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_q, d), lambda j, i, *prefetch: (i, 0)),
                corpus_spec,
            ],
            out_specs=[
                pl.BlockSpec((block_q, k), lambda j, i, *prefetch: (i, 0)),
                pl.BlockSpec((block_q, k), lambda j, i, *prefetch: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((qp, k), jnp.float32),
                pltpu.VMEM((qp, k), jnp.int32),
            ]
            + (
                # Block-major staging buffer for the two-level merge's
                # dynamic sub-block extraction (see _merge_tile_twolevel).
                [pltpu.VMEM((block_n // _TWOLEVEL_SUB, block_q, _TWOLEVEL_SUB), jnp.float32)]
                if variant == "twolevel"
                else []
            ),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((qp, k), jnp.float32),
            jax.ShapeDtypeStruct((qp, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * np_ * d,
            bytes_accessed=np_ * d * corpus_t.dtype.itemsize + qp * d * queries.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(limit, jnp.int32), (1,)), queries, corpus_t)
    return out_s[:q], out_i[:q]


def _big_q_tiles(corpus_dtype, precision: str, n_queries: Optional[int]) -> bool:
    """True when the measured-winner large-Q regime applies: >=128 queries
    on a tier whose kernel runs 128-row LHS tiles (int8, or bf16 single-pass
    'fast'). The exact tier (f32 math) keeps its own measured defaults."""
    return (
        n_queries is not None
        and n_queries >= 128
        and (
            corpus_dtype == jnp.int8
            or (corpus_dtype == jnp.bfloat16 and precision == "fast")
        )
    )


def _default_variant(
    corpus_dtype, precision: str, n_queries: Optional[int], block_q: int
) -> str:
    """Measured-winner merge variant (probe_results.log, v5e).

    ``maxlazy`` wins at large Q with block_q=128 — lazy in-body id
    extraction makes the per-tile prologue one row-max, and big query tiles
    make improvements rare enough that the pricier body never dominates:
    int8 Q=1024/1M 11.94 -> 11.33 ms (90.4K QPS), 10M 73.13 -> 66.85 ms
    (15.3K QPS), bf16 Q=1024/1M 15.08 -> 14.50 ms. It is tied to the
    block_q=128 regime: at block_q=64 maxlazy measured a REGRESSION (int8
    Q=1024 13.10 vs 12.68 ms), so small-Q batches, the f32-exact tier, AND
    a caller-pinned block_q < 128 all keep the invariant merge (the
    RESOLVED block size gates the choice, not just the query count).
    ``RAGFIN_MERGE_VARIANT`` overrides for A/B probes."""
    if _MERGE_VARIANT is not None:
        return _MERGE_VARIANT
    if _big_q_tiles(corpus_dtype, precision, n_queries) and block_q >= 128:
        return "maxlazy"
    return "invariant"


def _default_blocks(corpus_dtype, block_q, block_n, precision="fast", n_queries=None):
    """Measured-winner default tile sizes (probe_results.log, v5e).

    Big corpus blocks amortize per-grid-step overhead. ``block_q`` is
    Q-dependent: at small Q, 64 halves the VPU merge-pass width (padded
    rows cost real passes); at Q >= 128 a 128-row LHS fills the MXU's
    sublanes and halves the grid-step count — measured (with the maxlazy
    merge, `_default_variant`) int8 Q=1024 12.68 -> 11.33 ms @1M and
    79.97 -> 66.85 ms @10M; bf16 Q=1024 15.08 -> 14.50 ms @1M. ``block_n``
    is bounded by the 16 MB scoped-VMEM budget (two double-buffered corpus
    tiles + the f32 score tile): at block_q=64 int8 fits 8192 and bf16
    single-pass fits 6144; at block_q=128 the wider accumulator state
    shifts the winners down (int8: bn=6144 measured 11.33/66.85 vs 11.94
    @8192; bf16: bn=4096 measured 14.50 vs 14.74 @6144). The exact tier
    keeps f32 queries, so a bf16 corpus tile is upcast to an f32 copy
    in-kernel — that (and a plain f32 corpus) stays at 2048."""
    if block_q is None:
        block_q = 128 if _big_q_tiles(corpus_dtype, precision, n_queries) else 64
    if block_n is None:
        if corpus_dtype == jnp.int8:
            block_n = 6144 if block_q >= 128 else 8192
        elif corpus_dtype == jnp.bfloat16 and precision == "fast":
            block_n = 4096 if block_q >= 128 else 6144
        else:
            block_n = 2048
    return block_q, block_n


def cosine_topk_fused(
    queries: jax.Array,
    corpus_t: jax.Array,
    k: int,
    n_valid: Optional[int] = None,
    block_q: Optional[int] = None,
    block_n: Optional[int] = None,
    precision: str = "exact",
    interpret: Optional[bool] = None,
    slice_n: Optional[int] = None,
    variant: Optional[str] = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused matmul + k-select Pallas kernel (see module docstring).

    ``corpus_t`` may be the flat ``[D, N]`` layout or the tile-major
    ``[n_tiles, D, block_n]`` layout from :func:`tile_corpus_t` (contiguous
    block DMAs — the fast path; ``block_n`` is then taken from the layout).
    ``slice_n`` bounds the merge's per-iteration VPU pass width (see
    :func:`_merge_tile_sliced`); default from ``RAGFIN_MERGE_SLICE``.
    Block sizes default to the measured winners (:func:`_default_blocks`).
    Falls back to interpret mode automatically off-TPU so the same call sites
    work on the CPU test mesh.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if slice_n is None:
        slice_n = _MERGE_SLICE
    block_q, block_n = _default_blocks(
        corpus_t.dtype, block_q, block_n, precision, n_queries=queries.shape[0]
    )
    if variant is None:
        variant = _default_variant(
            corpus_t.dtype, precision, queries.shape[0], block_q
        )
    return _fused_call(
        queries, corpus_t, k, n_valid, block_q, block_n, precision, interpret,
        slice_n, variant,
    )


def _fused_kernel_int8(
    n_valid_ref,
    q_ref,       # [TQ, D] int8
    qs_ref,      # [TQ, 1] f32 query scales
    ct_ref,      # [D, TN] int8
    cs_ref,      # [1, TN] f32 corpus scales
    out_s_ref,
    out_i_ref,
    acc_s,
    acc_i,
    *scratch,
    k: int,
    block_q: int,
    block_n: int,
    slice_n: int,
    variant: str,
):
    """Int8 variant of the fused kernel: int8×int8 MXU matmul with int32
    accumulation, dequantized on-chip by per-row/per-column scales.
    Corpus-major grid like :func:`_fused_kernel`."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    rows = pl.ds(i * block_q, block_q)

    @pl.when(j == 0)
    def _init():
        acc_s[rows] = jnp.full((block_q, k), NEG_INF, acc_s.dtype)
        acc_i[rows] = jnp.full((block_q, k), _INT_MAX, acc_i.dtype)

    rhs = ct_ref[0] if ct_ref.ndim == 3 else ct_ref[:]
    cscale = cs_ref[0] if cs_ref.ndim == 3 else cs_ref[:]
    int_scores = jnp.dot(q_ref[:], rhs, preferred_element_type=jnp.int32)
    # The per-ROW query scale is a positive constant within each row, so it
    # cannot change the selection order — defer it to the flush ([TQ, k]
    # elements) instead of a full [TQ, TN] multiply pass on every tile.
    # Only the per-COLUMN corpus scale must be applied before the merge.
    scores = int_scores.astype(jnp.float32) * cscale
    col0 = j * block_n
    if variant not in ("twolevel", "mlazy"):
        iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, scores.shape[-1]), 1)
        valid_row = (col0 + iota_row) < n_valid_ref[0]
        scores = jnp.where(valid_row, scores, NEG_INF)

    _merge_tile(
        scores, col0, acc_s, acc_i, rows, j, k=k, slice_n=slice_n,
        variant=variant, n_valid=n_valid_ref[0],
        buf=scratch[0] if scratch else None,
    )

    @pl.when(j == pl.num_programs(0) - 1)
    def _flush():
        s = acc_s[rows]
        # Apply the deferred per-row query scale; keep the NEG_INF sentinel
        # exact (NEG_INF * 0.0 would be NaN for an all-zero query row).
        out_s_ref[:] = jnp.where(s == NEG_INF, NEG_INF, s * qs_ref[:])
        out_i_ref[:] = acc_i[rows]


@functools.partial(
    jax.jit, static_argnames=("k", "block_q", "block_n", "interpret", "slice_n", "variant")
)
def _fused_call_int8(queries, corpus_i8, scales, k, n_valid, block_q, block_n, interpret, slice_n, variant):
    from .quantize import quantize_queries

    q, d = queries.shape
    tiled = corpus_i8.ndim == 3  # [n_tiles, D, block_n] tile-major layout
    if tiled:
        if n_valid is None:
            raise ValueError("a tile-major [n_tiles, D, block_n] corpus requires n_valid")
        block_n = corpus_i8.shape[2]
        n = corpus_i8.shape[0] * block_n
    else:
        n = corpus_i8.shape[1]
    limit = _limit(n_valid, n)

    q8, qscale = quantize_queries(queries)
    pad_q = -q % block_q
    pad_n = -n % block_n
    if pad_q:
        q8 = jnp.pad(q8, ((0, pad_q), (0, 0)))
        qscale = jnp.pad(qscale, ((0, pad_q), (0, 0)))
    if pad_n and not tiled:
        corpus_i8 = jnp.pad(corpus_i8, ((0, 0), (0, pad_n)))
        scales = jnp.pad(scales, ((0, 0), (0, pad_n)))
    qp = q8.shape[0]
    np_ = corpus_i8.shape[0] * block_n if tiled else corpus_i8.shape[1]

    grid = (np_ // block_n, qp // block_q)
    kernel = functools.partial(
        _fused_kernel_int8, k=k, block_q=block_q, block_n=block_n, slice_n=slice_n, variant=variant
    )
    corpus_spec = (
        pl.BlockSpec((1, d, block_n), lambda j, i, *prefetch: (j, 0, 0))
        if tiled
        else pl.BlockSpec((d, block_n), lambda j, i, *prefetch: (0, j))
    )
    scale_spec = (
        pl.BlockSpec((1, 1, block_n), lambda j, i, *prefetch: (j, 0, 0))
        if tiled
        else pl.BlockSpec((1, block_n), lambda j, i, *prefetch: (0, j))
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_q, d), lambda j, i, *prefetch: (i, 0)),
                pl.BlockSpec((block_q, 1), lambda j, i, *prefetch: (i, 0)),
                corpus_spec,
                scale_spec,
            ],
            out_specs=[
                pl.BlockSpec((block_q, k), lambda j, i, *prefetch: (i, 0)),
                pl.BlockSpec((block_q, k), lambda j, i, *prefetch: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((qp, k), jnp.float32),
                pltpu.VMEM((qp, k), jnp.int32),
            ]
            + (
                [pltpu.VMEM((block_n // _TWOLEVEL_SUB, block_q, _TWOLEVEL_SUB), jnp.float32)]
                if variant == "twolevel"
                else []
            ),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((qp, k), jnp.float32),
            jax.ShapeDtypeStruct((qp, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * np_ * d, bytes_accessed=np_ * d + qp * d, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(limit, jnp.int32), (1,)), q8, qscale, corpus_i8, scales)
    return out_s[:q], out_i[:q]


def cosine_topk_fused_int8(
    queries: jax.Array,
    corpus_i8: jax.Array,
    scales: jax.Array,
    k: int,
    n_valid: Optional[int] = None,
    block_q: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
    slice_n: Optional[int] = None,
    variant: Optional[str] = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused top-k over an int8-quantized corpus (see ops/quantize.py).

    ``corpus_i8`` is [D, N] int8 with per-column ``scales`` [1, N] — or the
    tile-major pair from :func:`tile_corpus_t` / :func:`tile_scales`
    ([n_tiles, D, block_n] + [n_tiles, 1, block_n], contiguous block DMAs).
    Queries are f32 and quantized on device. 4× less HBM traffic than f32 at
    ~1e-2 relative score error — ranking agreement verified in tests.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if slice_n is None:
        slice_n = _MERGE_SLICE
    block_q, block_n = _default_blocks(
        jnp.int8, block_q, block_n, n_queries=queries.shape[0]
    )
    if variant is None:
        variant = _default_variant(jnp.int8, "fast", queries.shape[0], block_q)
    return _fused_call_int8(
        queries, corpus_i8, scales, k, n_valid, block_q, block_n, interpret,
        slice_n, variant,
    )


def cosine_topk(
    queries: jax.Array,
    corpus_t: jax.Array,
    k: int,
    n_valid: Optional[int] = None,
    method: str = "auto",
    precision: str = "exact",
) -> tuple[jax.Array, jax.Array]:
    """Dispatching entry point used by the vector index.

    ``auto`` picks the fused Pallas kernel on TPU for large corpora and the
    dense XLA path for small ones (kernel launch overhead dominates below a
    few thousand rows).
    """
    if method == "auto":
        on_tpu = jax.default_backend() == "tpu"
        method = "fused" if (on_tpu and corpus_t.shape[1] >= 65536) else "dense"
    if method == "dense":
        return cosine_topk_dense(queries, corpus_t, k, n_valid, precision)
    if method == "blocked":
        return cosine_topk_blocked(queries, corpus_t, k, n_valid=n_valid, precision=precision)
    if method == "fused":
        return cosine_topk_fused(queries, corpus_t, k, n_valid=n_valid, precision=precision)
    raise ValueError(f"unknown top-k method: {method}")
