"""IVF-style cluster-pruned approximate top-k (TPU-native IVF_FLAT).

The reference indexes with Milvus ``IVF_FLAT`` (``nlist=128``, COSINE —
``chunking_storing (1).py:29``): vectors are clustered, a query scores the
cluster centroids and scans only the best ``nprobe`` clusters. This module is
the TPU-native equivalent, designed around the Pallas grid rather than
inverted lists:

- **Cells are corpus tiles.** The corpus is permuted cluster-major and packed
  into the tile-major layout ``[n_cells, D, cell]`` (``cell == block_n``), so
  one cluster == one kernel block == one contiguous HBM DMA.
- **Probing is data-dependent block selection.** A tiny XLA stage scores the
  query batch against the cell centroids and emits a per-query-tile probe
  list ``[q_tiles, nprobe]``; the fused kernel's corpus ``BlockSpec`` index
  map reads it via scalar prefetch, so only probed cells are ever DMA'd from
  HBM. Compute and memory traffic scale with ``nprobe/n_cells``, exactly
  like IVF's ``nprobe/nlist``.
- **Selection is the exact streaming merge** from :mod:`ragfin_tpu.ops.topk`
  over the probed cells (probe lists are sorted ascending so permuted ids
  grow monotonically and the strict-``>`` tie-break stays exact *within the
  probed subset*).

Approximation error therefore comes only from cluster pruning (a true
neighbor living in an unprobed cell), the same failure mode as IVF_FLAT;
``nprobe == n_cells`` degenerates to the exact kernel (tested).

Cells are balanced (every cell holds exactly ``cell`` vectors) because the
kernel wants static shapes: build runs Lloyd iterations with device matmuls
and a host greedy capacity assignment (build-time only). Pad columns are
permuted to the tail cells so the ``n_valid`` mask works unchanged.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk import NEG_INF, _INT_MAX, _limit, _merge_tile, _PRECISIONS


class IVFIndex(NamedTuple):
    """Device-resident IVF structure (all static shapes).

    cells:       [n_cells, D, cell]  corpus tiles, cluster-major (bf16/f32
                 — or int8 with ``scales`` set)
    scales:      [n_cells, 1, cell]  int8 per-column scales, or None
    centroids:   [n_cells, D] f32    cell centroids (unnormalized means)
    orig_ids:    [n_cells * cell] int32  permuted position -> original id
                 (_INT_MAX for pad columns)
    n_valid:     int                  number of real (non-pad) vectors
    """

    cells: jax.Array
    scales: Optional[jax.Array]
    centroids: jax.Array
    orig_ids: jax.Array
    n_valid: int

    @property
    def n_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def cell(self) -> int:
        return self.cells.shape[2]


def _balanced_assign(scores_top: np.ndarray, cand: np.ndarray, capacity: np.ndarray) -> np.ndarray:
    """Capacity-constrained assignment (host, build-time), fully vectorized.

    ``cand [N, c]`` are each point's best-scoring candidate cells (descending),
    ``scores_top [N, c]`` the matching scores, ``capacity [n_cells]`` the free
    slots per cell (sum must be >= N). Candidate ranks are processed left to
    right; within a rank, points claim their cell's free slots in descending
    best-score priority. Overflow past the candidate list fills remaining
    slots arbitrarily (boundary points — the recall cost ``nprobe`` absorbs).

    A per-point sequential greedy (try rank 0, then 1, ...) is O(N) Python
    at 10M points — minutes per Lloyd iteration; the rank-pass formulation
    is a handful of argsorts and gives first-choice claims global priority
    over later-rank claims (at least as local as the sequential order)."""
    n, c = cand.shape
    n_cells = capacity.shape[0]
    capacity = capacity.copy()
    assign = np.full(n, -1, np.int64)
    # Priority = descending best score; stable sorts keep it within groups.
    order = np.argsort(-scores_top[:, 0], kind="stable")
    for r in range(c):
        un = order[assign[order] < 0]
        if un.size == 0:
            break
        cells = cand[un, r].astype(np.int64)
        by_cell = np.argsort(cells, kind="stable")
        sorted_cells = cells[by_cell]
        # Rank of each point within its cell's claimants (priority order).
        group_start = np.searchsorted(sorted_cells, sorted_cells, side="left")
        rank_in_group = np.arange(sorted_cells.size) - group_start
        ok = rank_in_group < capacity[sorted_cells]
        chosen = un[by_cell[ok]]
        assign[chosen] = sorted_cells[ok]
        capacity -= np.bincount(sorted_cells[ok], minlength=n_cells)
    unplaced = np.flatnonzero(assign < 0)
    if unplaced.size:
        free = np.repeat(np.arange(n_cells), capacity)
        assign[unplaced] = free[: unplaced.size]
    return assign


@functools.partial(jax.jit, static_argnames=("topc", "block_cols"))
def _candidate_cells(corpus_t: jax.Array, centroids: jax.Array, topc: int, block_cols: int):
    """Per-point top-``topc`` candidate cells, streamed over column blocks of
    the [D, N] corpus so neither the [N, C] score matrix (10M x 4883 f32
    would be ~190 GB) nor an f32 [N, D] transpose copy ever materializes
    (10M x 384 f32 = 15 GB would not fit next to the corpus in HBM)."""
    d, n = corpus_t.shape
    n_blocks = n // block_cols

    def step(_, blk):
        cols = jax.lax.dynamic_slice(corpus_t, (0, blk * block_cols), (d, block_cols))
        s = jnp.dot(
            centroids.astype(corpus_t.dtype), cols, preferred_element_type=jnp.float32
        )  # [C, B]
        ts, ti = jax.lax.top_k(s.T, topc)
        return 0, (ts, ti)

    _, (ts, ti) = jax.lax.scan(step, 0, jnp.arange(n_blocks, dtype=jnp.int32))
    return ts.reshape(n, topc), ti.reshape(n, topc).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_cells", "block_cols"))
def _cell_means(corpus_t: jax.Array, assign: jax.Array, n_cells: int, block_cols: int) -> jax.Array:
    """Cell means, streamed over column blocks (same memory rationale)."""
    d, n = corpus_t.shape
    n_blocks = n // block_cols

    def step(carry, blk):
        sums, counts = carry
        cols = jax.lax.dynamic_slice(corpus_t, (0, blk * block_cols), (d, block_cols))
        seg = jax.lax.dynamic_slice_in_dim(assign, blk * block_cols, block_cols, 0)
        # num_segments includes a dump slot (id n_cells) for scan-pad
        # columns so zero pads never dilute a real cell's centroid.
        sums = sums + jax.ops.segment_sum(
            cols.T.astype(jnp.float32), seg, num_segments=n_cells + 1
        )
        counts = counts + jax.ops.segment_sum(
            jnp.ones((block_cols,), jnp.float32), seg, num_segments=n_cells + 1
        )
        return (sums, counts), None

    init = (
        jnp.zeros((n_cells + 1, d), jnp.float32),
        jnp.zeros((n_cells + 1,), jnp.float32),
    )
    (sums, counts), _ = jax.lax.scan(step, init, jnp.arange(n_blocks, dtype=jnp.int32))
    return (sums / jnp.maximum(counts, 1.0)[:, None])[:n_cells]


def build_ivf(
    corpus_t: jax.Array,
    cell: int = 2048,
    iters: int = 4,
    candidates: int = 16,
    seed: int = 0,
    quantize: bool = False,
    free_source: bool = False,
) -> IVFIndex:
    """Cluster the corpus into balanced ``cell``-sized tiles.

    ``corpus_t`` is the flat ``[D, N]` layout (any float dtype). Lloyd
    iterations score on device (blocked matmuls); the balanced assignment is
    a host pass. With ``quantize`` the cells are stored int8 (the 4x-less-HBM
    production tier).

    ``candidates`` bounds how far a point can fall from its best cell under
    capacity pressure: when a natural cluster is larger than ``cell``, its
    overflow points take their next-best candidate with free slots — past
    the candidate list they are placed arbitrarily and become unreachable at
    any small ``nprobe``. 16 candidates measured the difference between a
    ~0.57 recall plateau and nprobe actually converging on oversized-cluster
    corpora."""
    d, n = corpus_t.shape
    pad = -n % cell
    if pad:
        corpus_t = jnp.pad(corpus_t, ((0, 0), (0, pad)))
    n_pad = n + pad
    n_cells = n_pad // cell

    # Reserve the TAIL cells' final slots for pad columns: the kernel masks
    # invalid columns by permuted position (< n_valid), so every pad must end
    # up in the last `pad` permuted positions. Real points are assigned with
    # these reduced capacities; pads then fill exactly the reserved slots,
    # and the stable within-cell order keeps them after the reals.
    capacity = np.full(n_cells, cell, np.int64)
    rem, ci = pad, n_cells - 1
    while rem > 0:
        take = min(rem, int(capacity[ci]))
        capacity[ci] -= take
        rem -= take
        ci -= 1

    def with_pads(assign_real: np.ndarray) -> np.ndarray:
        free = np.full(n_cells, cell, np.int64) - np.bincount(
            assign_real, minlength=n_cells
        )
        return np.concatenate([assign_real, np.repeat(np.arange(n_cells), free)])

    def means_segments(assign_np: np.ndarray) -> jax.Array:
        # For centroid means, corpus zero-pad columns go to the DUMP slot
        # (id n_cells) — their tail-cell assignment is only for the
        # permutation; counting them as members would dilute tail-cell
        # centroid magnitudes and under-score those cells at probe time.
        seg = assign_np.copy()
        seg[n:] = n_cells
        return jnp.asarray(
            np.concatenate([seg, np.full(scan_pad, n_cells, np.int64)])
        )

    # Pick the scan block as a whole number of cells that DIVIDES n_pad:
    # a non-dividing block would need the corpus padded to the scan grid —
    # a full second copy of the corpus (7.7 GB at 10M bf16, an HBM OOM).
    div = max(k for k in range(1, min(32, n_cells) + 1) if n_cells % k == 0)
    block_cols = div * cell
    scan_pad = 0
    ct_scan = corpus_t

    # Init from random real points (contiguous-chunk means of shuffled data
    # all collapse to the global mean and Lloyd never recovers structure).
    rng = np.random.default_rng(seed)
    picks = jnp.asarray(rng.choice(n, size=n_cells, replace=False))
    centroids = jnp.asarray(corpus_t[:, picks].T, jnp.float32)

    topc = min(candidates, n_cells)
    assign_np = None
    for it in range(max(iters, 1)):
        if it:
            centroids = _cell_means(ct_scan, means_segments(assign_np), n_cells, block_cols)
        ts, ti = _candidate_cells(ct_scan, centroids, topc, block_cols)
        ts_np = np.asarray(ts[:n])
        ti_np = np.asarray(ti[:n])
        assign_real = _balanced_assign(ts_np, ti_np, capacity)
        assign_np = with_pads(assign_real)

    # Permutation: cluster-major order, stable within a cell (pads were
    # appended after all real points, so they sort last within their cell
    # and — via the tail-cell reservation — occupy the global tail).
    perm = np.argsort(assign_np, kind="stable")  # [N_pad] permuted pos -> input pos
    orig_ids = np.where(perm < n, perm, _INT_MAX).astype(np.int32)
    assert pad == 0 or bool(np.all(perm[n_pad - pad:] >= n)), "pads must sort last"

    # Final centroids from the final assignment (pre-permutation order —
    # the permutation only reorders points within the same cell structure).
    centroids = _cell_means(ct_scan, means_segments(assign_np), n_cells, block_cols)
    del ct_scan

    # Quantize BEFORE the permutation gather so the 10M-scale gather happens
    # on the int8 copy (3.8 GB) instead of a second bf16/f32 copy. With
    # ``free_source`` (caller holds no other reference to ``corpus_t``) the
    # bf16/f32 source is dropped before the gather — at 10M the source +
    # int8 copy + gathered copy would not fit 16 GB HBM together.
    perm_dev = jnp.asarray(perm)
    scales = None
    if quantize:
        from .quantize import quantize_corpus_t

        c8, sc = quantize_corpus_t(corpus_t)
        if free_source:
            del corpus_t
        c8 = jnp.take(c8, perm_dev, axis=1)
        sc = jnp.take(sc, perm_dev, axis=1)
        cells = jnp.transpose(jnp.reshape(c8, (d, n_cells, cell)), (1, 0, 2))
        scales = jnp.transpose(jnp.reshape(sc, (1, n_cells, cell)), (1, 0, 2))
    else:
        corpus_perm = jnp.take(corpus_t, perm_dev, axis=1)  # [D, N_pad]
        if free_source:
            del corpus_t
        cells = jnp.transpose(jnp.reshape(corpus_perm, (d, n_cells, cell)), (1, 0, 2))

    return IVFIndex(
        cells=cells,
        scales=scales,
        centroids=centroids,
        orig_ids=jnp.asarray(orig_ids),
        n_valid=n,
    )


def _pruned_kernel(
    n_valid_ref,
    probe_ref,  # [q_tiles, nprobe] int32 cell ids, ascending per row
    q_ref,
    ct_ref,  # [1, D, cell] — the probed cell (data-dependent BlockSpec)
    out_s_ref,
    out_i_ref,
    acc_s,
    acc_i,
    *,
    k: int,
    block_q: int,
    cell: int,
    precision: str,
    int8: bool,
    qs_ref=None,
    cs_ref=None,
):
    j = pl.program_id(0)  # probe position (0..nprobe)
    i = pl.program_id(1)  # query tile
    rows = pl.ds(i * block_q, block_q)

    @pl.when(j == 0)
    def _init():
        acc_s[rows] = jnp.full((block_q, k), NEG_INF, acc_s.dtype)
        acc_i[rows] = jnp.full((block_q, k), _INT_MAX, acc_i.dtype)

    if int8:
        int_scores = jnp.dot(q_ref[:], ct_ref[0], preferred_element_type=jnp.int32)
        scores = int_scores.astype(jnp.float32) * qs_ref[:] * cs_ref[0]
    else:
        lhs, rhs = q_ref[:], ct_ref[0]
        if lhs.dtype != rhs.dtype:
            rhs = rhs.astype(lhs.dtype)
        scores = jnp.dot(
            lhs, rhs, preferred_element_type=jnp.float32, precision=_PRECISIONS[precision]
        )

    # Ids live in PERMUTED corpus space; probe lists are sorted ascending so
    # they grow monotonically across j and the strict-> tie-break is exact.
    col0 = probe_ref[i, j] * cell
    local_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(local_ids < n_valid_ref[0], scores, NEG_INF)

    _merge_tile(scores, col0, acc_s, acc_i, rows, j, k=k, slice_n=0, variant="invariant")

    @pl.when(j == pl.num_programs(0) - 1)
    def _flush():
        out_s_ref[:] = acc_s[rows]
        out_i_ref[:] = acc_i[rows]


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "block_q", "precision", "interpret", "n_valid"),
)
def _ivf_call(
    queries,
    cells,
    scales,
    centroids,
    orig_ids,
    n_valid,
    k,
    nprobe,
    block_q,
    precision,
    interpret,
):
    q, d = queries.shape
    n_cells, _, cell = cells.shape
    nprobe = min(nprobe, n_cells)
    int8 = scales is not None

    # ---- probe selection (XLA): per-query-tile top-nprobe cells ----------
    pad_q = -q % block_q
    qf = jnp.pad(queries.astype(jnp.float32), ((0, pad_q), (0, 0))) if pad_q else queries.astype(jnp.float32)
    qp = qf.shape[0]
    q_tiles = qp // block_q
    cscores = jnp.dot(qf, centroids.T, preferred_element_type=jnp.float32)  # [qp, C]
    if pad_q:
        # Zero-pad query rows score 0.0 against every centroid and would
        # distort the tile's probe ranking; mask them out of the tile max.
        row = jax.lax.broadcasted_iota(jnp.int32, cscores.shape, 0)
        cscores = jnp.where(row < q, cscores, NEG_INF)

    # A tile's probe set serves ALL its queries, so co-tile queries that
    # need the same cells are the whole game: sort the batch by each
    # query's best cell (pads forced last) so a tile's probe union stays
    # small — the classic batched-IVF query-reorder, done as one gather.
    top1 = jnp.argmax(cscores, axis=-1).astype(jnp.int32)
    if pad_q:
        top1 = jnp.where(jax.lax.iota(jnp.int32, qp) < q, top1, n_cells)
    order = jnp.argsort(top1, stable=True)
    inv_order = jnp.argsort(order, stable=True)[:q]
    qf = qf[order]
    cscores = cscores[order]

    # Rank cells by the best affinity any query in the tile has to them.
    tile_scores = jnp.max(cscores.reshape(q_tiles, block_q, n_cells), axis=1)
    _, probe = jax.lax.top_k(tile_scores, nprobe)  # [q_tiles, nprobe]
    probe = jnp.sort(probe, axis=-1).astype(jnp.int32)  # ascending ids: exact ties

    if int8:
        from .quantize import quantize_queries

        q8, qscale = quantize_queries(queries)
        if pad_q:
            q8 = jnp.pad(q8, ((0, pad_q), (0, 0)))
            qscale = jnp.pad(qscale, ((0, pad_q), (0, 0)))
        q8 = q8[order]
        qscale = qscale[order]
        qin = q8
    else:
        qin = qf.astype(cells.dtype) if precision == "fast" else qf

    kernel = functools.partial(
        _pruned_kernel,
        k=k,
        block_q=block_q,
        cell=cell,
        precision=precision,
        int8=int8,
    )
    grid = (nprobe, q_tiles)
    in_specs = [
        pl.BlockSpec((block_q, d), lambda j, i, *pf: (i, 0)),
    ]
    operands = [qin]
    if int8:
        in_specs.append(pl.BlockSpec((block_q, 1), lambda j, i, *pf: (i, 0)))
        operands.append(qscale)
    # Data-dependent corpus block: DMA exactly the probed cell.
    in_specs.append(
        pl.BlockSpec((1, d, cell), lambda j, i, nv_ref, probe_ref: (probe_ref[i, j], 0, 0))
    )
    operands.append(cells)
    if int8:
        in_specs.append(
            pl.BlockSpec((1, 1, cell), lambda j, i, nv_ref, probe_ref: (probe_ref[i, j], 0, 0))
        )
        operands.append(scales)

    if int8:
        def kernel_wrapped(nv, pr, qr, qs, ct, cs, os_, oi, a_s, a_i):
            kernel(nv, pr, qr, ct, os_, oi, a_s, a_i, qs_ref=qs, cs_ref=cs)
    else:
        def kernel_wrapped(nv, pr, qr, ct, os_, oi, a_s, a_i):
            kernel(nv, pr, qr, ct, os_, oi, a_s, a_i)

    out_s, out_i = pl.pallas_call(
        kernel_wrapped,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((block_q, k), lambda j, i, *pf: (i, 0)),
                pl.BlockSpec((block_q, k), lambda j, i, *pf: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((qp, k), jnp.float32),
                pltpu.VMEM((qp, k), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((qp, k), jnp.float32),
            jax.ShapeDtypeStruct((qp, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * nprobe * cell * d,
            bytes_accessed=q_tiles * nprobe * cell * d * cells.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        jnp.reshape(jnp.asarray(_limit(n_valid, n_cells * cell), jnp.int32), (1,)),
        probe,
        *operands,
    )
    # Undo the query sort, then map permuted corpus positions back to
    # original ids (pads -> _INT_MAX).
    out_s, out_i = out_s[inv_order], out_i[inv_order]
    safe = jnp.minimum(out_i, orig_ids.shape[0] - 1)
    ids = jnp.where(out_i == _INT_MAX, _INT_MAX, orig_ids[safe])
    return out_s, ids


def ivf_topk(
    queries: jax.Array,
    index: IVFIndex,
    k: int,
    nprobe: int = 32,
    block_q: int = 128,
    precision: str = "fast",
    interpret: Optional[bool] = None,
) -> tuple[jax.Array, jax.Array]:
    """Approximate cosine top-k over an :class:`IVFIndex`.

    ``nprobe`` of the index's cells are scanned per query tile (ranked by
    centroid affinity). ``nprobe == index.n_cells`` is exhaustive and matches
    the exact kernel. Returns ids in ORIGINAL corpus order."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ivf_call(
        queries,
        index.cells,
        index.scales,
        index.centroids,
        index.orig_ids,
        index.n_valid,
        k,
        nprobe,
        block_q,
        precision,
        interpret,
    )
