"""Corpus-sharded exact top-k: one partition per chip, ICI all-gather merge.

Component T5 (SURVEY.md §2.1): the corpus embedding matrix is row-sharded one
partition per device over a 1-D mesh; each device runs the local exact top-k
(:mod:`ragfin_tpu.ops.topk`) over its partition, then the per-shard (score,
global-id) candidate sets — ``k`` pairs per shard, tiny — are merged with a
``jax.lax.all_gather`` over the mesh axis (ICI traffic: ``P·k·8`` bytes per
query, negligible) followed by a final k-selection. Result is replicated.

This replaces nothing in the reference (single-node Milvus); it is the scale
axis that makes 10M-chunk corpora query at speed-of-light (BASELINE.json).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..data.models import IndexedChunk
from ..models.bag_encoder import l2_normalize
from ..ops import topk as topk_ops
from .mesh import make_mesh


@functools.lru_cache(maxsize=128)
def _sharded_program(
    mesh: Mesh,
    axis: str,
    k: int,
    n_valid: int,
    method: str,
    precision: str,
    shard_cols: int,
    with_scales: bool,
):
    """Build + jit the shard_map top-k program once per configuration.

    Without this cache every search call re-traced the shard_map eagerly
    (measured: ~2.7s/call on the TPU tunnel vs ~ms for the cached
    executable); jit alone would not help because a fresh closure per call
    never hits the jit cache."""
    fn = _build_sharded(mesh, axis, k, n_valid, method, precision, shard_cols, with_scales)
    return jax.jit(fn)


def sharded_cosine_topk(
    mesh: Mesh,
    axis: str,
    queries: jax.Array,
    corpus_t_sharded: jax.Array,
    k: int,
    n_valid: int,
    method: str = "auto",
    precision: str = "exact",
    scales: "jax.Array | None" = None,
):
    """shard_map program: local exact top-k per shard + all-gather merge.

    ``corpus_t_sharded`` is [D, N_padded] sharded over columns on ``axis``;
    ``queries`` [Q, D] replicated. Returns replicated ([Q, k], [Q, k]).
    """
    n_total = corpus_t_sharded.shape[1]
    n_dev = mesh.shape[axis]
    shard_cols = n_total // n_dev
    if method == "auto":
        # Mirror ops.topk.cosine_topk's dispatch, per LOCAL shard size: the
        # fused Pallas kernel wins on TPU for large partitions (launch
        # overhead dominates small ones); quantized shards use the int8
        # kernel. Off-TPU (the CPU test mesh) dense avoids interpret mode.
        on_tpu = jax.default_backend() == "tpu"
        if not (on_tpu and shard_cols >= 65536):
            method = "dense" if scales is None else "int8"
        else:
            method = "fused" if scales is None else "int8"
    if method == "int8" and scales is None:
        raise ValueError("method='int8' requires scales")
    program = _sharded_program(
        mesh, axis, k, int(n_valid), method, precision, shard_cols, scales is not None
    )
    if scales is not None:
        return program(queries, corpus_t_sharded, scales)
    return program(queries, corpus_t_sharded)


def _build_sharded(
    mesh: Mesh,
    axis: str,
    k: int,
    n_valid: int,
    method: str,
    precision: str,
    shard_cols: int,
    with_scales: bool,
):
    def _merge(q, s, i, base):
        gids = i + base
        # Safety net: invalid candidates were already masked to -inf before
        # the local k-select (see `local`); re-mask here in case a fully-pad
        # shard returned sentinel ids (which may wrap past int32 when offset).
        s = jnp.where((gids >= 0) & (gids < n_valid), s, topk_ops.NEG_INF)
        # Candidate merge across shards rides ICI: P*k pairs per query.
        cand_s = jax.lax.all_gather(s, axis, axis=1, tiled=True)  # [Q, P*k]
        cand_i = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
        kk = min(k, cand_s.shape[1])
        top_s, sel = jax.lax.top_k(cand_s, kk)
        top_i = jnp.take_along_axis(cand_i, sel, axis=1)
        return top_s, top_i.astype(jnp.int32)

    local_k = min(k, shard_cols)

    if method == "int8":
        def local_int8(q, ct_local, scales_local):
            shard = jax.lax.axis_index(axis)
            base = shard * shard_cols
            # Mask pad columns BEFORE the local k-select: zero-pads score 0.0
            # and would displace valid negative-cosine candidates otherwise.
            lv = jnp.clip(n_valid - base, 0, shard_cols)
            s, i = topk_ops.cosine_topk_fused_int8(
                q, ct_local, scales_local, local_k, n_valid=lv
            )
            return _merge(q, s, i, base)

        return shard_map(
            local_int8,
            mesh=mesh,
            in_specs=(P(), P(None, axis), P(None, axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )

    def local(q, ct_local):
        shard = jax.lax.axis_index(axis)
        base = shard * shard_cols
        # Mask pad columns BEFORE the local k-select: zero-pads score 0.0
        # and would displace valid negative-cosine candidates otherwise.
        lv = jnp.clip(n_valid - base, 0, shard_cols)
        if method == "fused":
            s, i = topk_ops.cosine_topk_fused(
                q, ct_local, local_k, n_valid=lv, precision=precision
            )
        elif method == "blocked":
            s, i = topk_ops.cosine_topk_blocked(
                q, ct_local, local_k, n_valid=lv, precision=precision
            )
        else:
            s, i = topk_ops.cosine_topk_dense(
                q, ct_local, local_k, n_valid=lv, precision=precision
            )
        return _merge(q, s, i, base)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )


class ShardedVectorIndex:
    """Drop-in DeviceVectorIndex with the corpus sharded across a mesh.

    Mirrors :class:`ragfin_tpu.index.vector_index.DeviceVectorIndex`'s search
    API; metadata stays on host, embeddings are placed with a NamedSharding
    over the mesh's first axis so XLA DMAs each partition to its chip.
    """

    def __init__(
        self,
        embeddings: np.ndarray | jax.Array,
        records: Sequence[IndexedChunk],
        mesh: Optional[Mesh] = None,
        axis: Optional[str] = None,
        pad_multiple: int = 128,
        dtype: jnp.dtype = jnp.float32,
        normalize: bool = True,
    ):
        self.mesh = mesh if mesh is not None else make_mesh(("data",))
        self.axis = axis or self.mesh.axis_names[0]
        n_dev = self.mesh.shape[self.axis]

        embeddings = jnp.asarray(embeddings, jnp.float32)
        if normalize and embeddings.size:
            embeddings = l2_normalize(embeddings)
        self.n = embeddings.shape[0]
        self.dim = embeddings.shape[1]
        chunk = pad_multiple * n_dev
        pad = -self.n % chunk if self.n else chunk
        if pad:
            embeddings = jnp.pad(embeddings, ((0, pad), (0, 0)))
        sharding = NamedSharding(self.mesh, P(None, self.axis))
        self.quantized = str(dtype) in ("int8", "jnp.int8") or dtype == jnp.int8
        if self.quantized:
            # Mirror DeviceVectorIndex: dtype="int8" means QUANTIZE — a raw
            # astype of unit-norm f32 would truncate every value to 0 and
            # silently return arbitrary ids at score 0.0.
            from ..ops.quantize import quantize_corpus_t

            c8, sc = quantize_corpus_t(jnp.asarray(embeddings.T))
            self.matrix_t = jax.device_put(c8, sharding)
            self.scales = jax.device_put(sc, sharding)
        else:
            self.matrix_t = jax.device_put(jnp.asarray(embeddings.T, dtype=dtype), sharding)
            self.scales = None
        self.records = list(records)
        self._by_id = {r.id: i for i, r in enumerate(self.records)}
        # Query-encoding backends; populated by from_dense() or assignable.
        self.embedder = None
        self.encoder = None
        self.featurizer = None

    @classmethod
    def from_dense(cls, index, mesh: Optional[Mesh] = None, **kwargs) -> "ShardedVectorIndex":
        """Re-shard an existing DeviceVectorIndex across a mesh."""
        if getattr(index, "quantized", False):
            dense = np.asarray(
                (index.matrix_t.astype(jnp.float32) * index.scales)[:, : index.n].T
            )
        else:
            dense = np.asarray(index.matrix_t[:, : index.n].T)
        out = cls(
            dense,
            index.records,
            mesh=mesh,
            normalize=False,
            **kwargs,
        )
        out.embedder = getattr(index, "embedder", None)
        out.encoder = getattr(index, "encoder", None)
        out.featurizer = getattr(index, "featurizer", None)
        return out

    def search_embeddings(self, query_embeddings, top_k: int = 3, method: str = "auto"):
        q = jnp.asarray(query_embeddings, jnp.float32)
        k = min(top_k, max(self.n, 1))
        return sharded_cosine_topk(
            self.mesh, self.axis, q, self.matrix_t, k, n_valid=self.n,
            method=method, scales=self.scales,
        )

    def search_texts(
        self, queries, top_k: int = 3, method: str = "auto", query_expansion: bool = True
    ):
        from ..index.vector_index import SearchHit

        # Mirror DeviceVectorIndex.search_texts: prefer the semantic embedder
        # when the source index carried one (featurizer/encoder are None then).
        embedder = getattr(self, "embedder", None)
        queries = list(queries)
        if query_expansion and getattr(embedder, "backend", "hashed") == "hashed":
            from ..models.synonyms import expand_queries

            queries = expand_queries(queries)
        if embedder is not None:
            q = embedder.encode_texts(queries)
        elif self.featurizer is not None and self.encoder is not None:
            ids, wts = self.featurizer.encode_batch(queries)
            q = self.encoder.encode(ids, wts)
        else:
            raise ValueError(
                "ShardedVectorIndex has no embedder or featurizer/encoder; "
                "construct via from_dense() or assign one before search_texts"
            )
        scores, rows = self.search_embeddings(q, top_k=top_k, method=method)
        scores, rows = np.asarray(scores), np.asarray(rows)
        out = []
        for qi in range(len(queries)):
            hits = []
            for rank in range(scores.shape[1]):
                row = int(rows[qi, rank])
                if row < self.n and np.isfinite(scores[qi, rank]):
                    hits.append(SearchHit(float(scores[qi, rank]), self.records[row], rank))
            out.append(hits)
        return out

    def __len__(self) -> int:
        return self.n
