"""Multi-chip IVF: cluster cells sharded across devices, probe routing.

Extends T5 (corpus-sharded exact top-k, parallel/sharded.py) to the IVF
tier (ops/ivf.py): the balanced cell array ``[C, D, cell]`` is row-sharded
over a 1-D mesh — each device owns ``C/P`` cells — and a query's ``nprobe``
probed cells are scanned only by their owners (expert-routing shape: cells
are the "experts", centroid affinity is the router). Per-device candidate
top-k sets merge with one ``all_gather`` over ICI, exactly like the exact
sharded path; cells partition the corpus, so the merge needs no dedup.

Routing is implemented as masked ownership rather than gather/scatter: every
device walks the same ``[q_tiles, nprobe]`` probe list, takes a dynamic
slice of ITS cell shard for probes it owns, and contributes ``-inf`` for the
rest — compiler-friendly (static shapes, no data-dependent communication)
at the cost of each device stepping through all ``nprobe`` probe positions.
With balanced probe ownership the expected useful work per device is
``nprobe / P`` cells, and the wasted steps are cheap (one [TQ, D] x
[D, cell] matmul skipped via masking is still executed but tiny).

Scoring runs in plain XLA (``dynamic_slice`` + MXU matmul + streaming
top-k), not the scalar-prefetch Pallas kernel, so the same program runs on
the CPU test mesh and composes with shard_map without Mosaic constraints;
the single-chip Pallas IVF kernel remains the latency path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.ivf import IVFIndex
from ..ops.topk import NEG_INF, _INT_MAX


def pad_cells_for_mesh(ivf: IVFIndex, n_dev: int):
    """Pad the cell axis to a multiple of the mesh size with empty cells
    (zero vectors, _INT_MAX ids — they score -inf via the id mask)."""
    c = ivf.cells.shape[0]
    pad = -c % n_dev
    cells = ivf.cells
    scales = ivf.scales
    cell = cells.shape[2]
    ids = jnp.asarray(ivf.orig_ids).reshape(c, cell)
    if pad:
        cells = jnp.concatenate(
            [cells, jnp.zeros((pad,) + cells.shape[1:], cells.dtype)], axis=0
        )
        if scales is not None:
            scales = jnp.concatenate(
                [scales, jnp.zeros((pad,) + scales.shape[1:], scales.dtype)], axis=0
            )
        ids = jnp.concatenate(
            [ids, jnp.full((pad, cell), _INT_MAX, jnp.int32)], axis=0
        )
    return cells, scales, ids, c + pad


@functools.lru_cache(maxsize=64)
def _sharded_ivf_program(
    mesh: Mesh,
    axis: str,
    k: int,
    nprobe: int,
    block_q: int,
    c_total: int,
    int8: bool,
):
    n_dev = mesh.shape[axis]
    c_local = c_total // n_dev

    def local_scan(probe, q_tile, cells_l, scales_l, ids_l):
        """One device's top-k for one query tile over its owned probes.

        probe: [nprobe] global cell ids; q_tile: [block_q, D];
        cells_l: [c_local, D, cell]; ids_l: [c_local, cell]."""
        shard = jax.lax.axis_index(axis)
        base = shard * c_local

        def step(carry, p):
            run_s, run_i = carry
            li = p - base
            owned = (li >= 0) & (li < c_local)
            sl = jnp.clip(li, 0, c_local - 1)
            block = jax.lax.dynamic_index_in_dim(cells_l, sl, 0, keepdims=False)
            ids = jax.lax.dynamic_index_in_dim(ids_l, sl, 0, keepdims=False)  # [cell]
            if int8:
                s8 = jax.lax.dynamic_index_in_dim(scales_l, sl, 0, keepdims=False)
                scores = (
                    jnp.dot(
                        q_tile, block.astype(jnp.float32),
                        preferred_element_type=jnp.float32,
                    )
                    * s8
                )
            else:
                scores = jnp.dot(
                    q_tile, block.astype(q_tile.dtype),
                    preferred_element_type=jnp.float32,
                )
            valid = owned & (ids != _INT_MAX)[None, :]
            scores = jnp.where(valid, scores, NEG_INF)
            cat_s = jnp.concatenate([run_s, scores], axis=1)
            cat_i = jnp.concatenate(
                [run_i, jnp.broadcast_to(ids[None, :], scores.shape)], axis=1
            )
            new_s, sel = jax.lax.top_k(cat_s, k)
            new_i = jnp.take_along_axis(cat_i, sel, axis=1)
            return (new_s, new_i), None

        init = (
            jnp.full((block_q, k), NEG_INF),
            jnp.full((block_q, k), jnp.int32(_INT_MAX)),
        )
        (s, i), _ = jax.lax.scan(step, init, probe)
        return s, i

    def program(queries, probes, cells_l, scales_l, ids_l):
        """queries: [q_tiles, block_q, D] replicated; probes: [q_tiles,
        nprobe] replicated; cells/scales/ids: this device's shard."""

        def per_tile(carry, tile):
            q_tile, probe = tile
            s, i = local_scan(probe, q_tile, cells_l, scales_l, ids_l)
            return carry, (s, i)

        _, (s, i) = jax.lax.scan(per_tile, 0, (queries, probes))
        s = s.reshape(-1, k)
        i = i.reshape(-1, k)
        # Candidate merge across shards rides ICI: P*k pairs per query.
        cand_s = jax.lax.all_gather(s, axis, axis=1, tiled=True)
        cand_i = jax.lax.all_gather(i, axis, axis=1, tiled=True)
        top_s, sel = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, sel, axis=1)
        return top_s, top_i.astype(jnp.int32)

    shard_spec = P(axis)
    fn = shard_map(
        program,
        mesh=mesh,
        in_specs=(P(), P(), shard_spec, shard_spec, shard_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_ivf_topk(
    mesh: Mesh,
    axis: str,
    queries: jax.Array,
    cells_sharded: jax.Array,
    scales_sharded,
    ids_sharded: jax.Array,
    centroids: jax.Array,
    k: int,
    nprobe: int = 32,
    block_q: int = 8,
    n_cells_real: Optional[int] = None,
):
    """Cluster-pruned top-k over mesh-sharded cells.

    ``cells_sharded [C, D, cell]`` / ``ids_sharded [C, cell]`` (and
    ``scales_sharded`` for int8) are device_put with ``P(axis)`` on the cell
    axis (see :func:`shard_ivf_arrays`); ``centroids [C, D]`` replicated.
    ``n_cells_real`` is the count of REAL (non-pad) cells — pad cells are
    excluded from probe selection by index (a constant pad-centroid value
    cannot do it: its affinity is value*sum(q), which is hugely positive
    for any query with negative coordinate sum and would steal every probe
    slot). Returns replicated ([Q, k], [Q, k]) with ORIGINAL corpus ids.
    """
    c_total = cells_sharded.shape[0]
    n_dev = mesh.shape[axis]
    int8 = scales_sharded is not None
    q, d = queries.shape
    if n_cells_real is None:
        n_cells_real = c_total
    nprobe = min(nprobe, c_total)

    # Probe selection is replicated and tiny: [Q, C] centroid affinities.
    qf = jnp.asarray(queries, jnp.float32)
    pad_q = -q % block_q
    if pad_q:
        qf = jnp.pad(qf, ((0, pad_q), (0, 0)))
    qp = qf.shape[0]
    q_tiles = qp // block_q
    cscores = jnp.dot(qf, centroids.T, preferred_element_type=jnp.float32)
    if n_cells_real < c_total:
        col = jax.lax.broadcasted_iota(jnp.int32, cscores.shape, 1)
        cscores = jnp.where(col < n_cells_real, cscores, NEG_INF)
    if pad_q:
        row = jax.lax.broadcasted_iota(jnp.int32, cscores.shape, 0)
        cscores = jnp.where(row < q, cscores, NEG_INF)
    # Same batched-IVF query-reorder as the single-device path
    # (ops/ivf.py:_ivf_call): sort the batch by each query's best cell so a
    # tile's probe union stays small — without it, mixed tiles dilute the
    # shared probe set and recall collapses at small nprobe.
    top1 = jnp.argmax(cscores, axis=-1).astype(jnp.int32)
    if pad_q:
        top1 = jnp.where(jax.lax.iota(jnp.int32, qp) < q, top1, centroids.shape[0])
    order = jnp.argsort(top1, stable=True)
    inv_order = jnp.argsort(order, stable=True)[:q]
    qf = qf[order]
    cscores = cscores[order]
    tile_scores = jnp.max(cscores.reshape(q_tiles, block_q, -1), axis=1)
    _, probes = jax.lax.top_k(tile_scores, nprobe)
    probes = jnp.sort(probes, axis=-1).astype(jnp.int32)

    program = _sharded_ivf_program(
        mesh, axis, k, nprobe, block_q, c_total, int8
    )
    q_resh = qf.reshape(q_tiles, block_q, d)
    scales_arg = scales_sharded
    if scales_arg is None:
        # Placeholder so the program arity is static; never read (int8=False).
        scales_arg = jnp.zeros((c_total, 1, cells_sharded.shape[2]), jnp.float32)
        scales_arg = jax.device_put(
            scales_arg, NamedSharding(mesh, P(axis))
        )
    s, i = program(q_resh, probes, cells_sharded, scales_arg, ids_sharded)
    return s[inv_order], i[inv_order]


class ShardedIVFArrays(tuple):
    """(cells, scales, ids, centroids, n_cells_real) — a named tuple-alike
    so existing 4-way unpacking fails loudly rather than silently dropping
    the pad count."""

    __slots__ = ()


def shard_ivf_arrays(mesh: Mesh, axis: str, ivf: IVFIndex) -> ShardedIVFArrays:
    """device_put an IVFIndex's arrays for :func:`sharded_ivf_topk`.

    Returns ``(cells, scales, ids, centroids, n_cells_real)``; pass
    ``n_cells_real`` through so probe selection can exclude pad cells by
    index."""
    n_dev = mesh.shape[axis]
    n_real = ivf.cells.shape[0]
    cells, scales, ids, c_total = pad_cells_for_mesh(ivf, n_dev)
    spec = NamedSharding(mesh, P(axis))
    cells = jax.device_put(cells, spec)
    if scales is not None:
        scales = jax.device_put(scales, spec)
    ids = jax.device_put(ids, spec)
    centroids = jnp.asarray(ivf.centroids)
    if c_total > centroids.shape[0]:
        # Pad centroid VALUES are irrelevant — probe selection masks pad
        # columns by index (see sharded_ivf_topk) — zeros keep dtypes tidy.
        centroids = jnp.concatenate(
            [
                centroids,
                jnp.zeros(
                    (c_total - centroids.shape[0], centroids.shape[1]),
                    centroids.dtype,
                ),
            ],
            axis=0,
        )
    return ShardedIVFArrays((cells, scales, ids, centroids, n_real))
