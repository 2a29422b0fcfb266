"""Row-sharded device graph match: T3 on a multi-chip mesh (verdict r3 #7).

The fact table's id columns (quarter/entity/type/company + validity) are
row-sharded one partition per device over a 1-D mesh; the small bit-mask
operands (quarter/entity/type/company vocab masks) are replicated. Each
device evaluates the masked predicate over its rows gather-free
(:func:`ragfin_tpu.index.graph_index._mask_lookup`), selects its local
first-``k`` rows by global CSR rank, and the per-shard (rank, global-row)
candidate sets — ``k`` pairs each, tiny — merge with one ICI
``all_gather`` + final k-selection, exactly the
:mod:`ragfin_tpu.parallel.sharded` vector-search pattern applied to the
graph store.

Parity contract: results are identical (same rows, same CSR order) to the
single-device :meth:`GraphIndex.match` for any mask combination — asserted
in the multichip dryrun (stage 6) and the CPU-mesh tests.

Hybrid fusion over sharded results needs no new device code: both sharded
searches return replicated (score, id) candidates, and
:func:`ragfin_tpu.ops.fusion.fuse_results` fuses them as-is — fusion is
O(k) regardless of corpus sharding.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..index.graph_index import _RANK_MISS, _mask_lookup
from .mesh import make_mesh


@functools.lru_cache(maxsize=64)
def _sharded_match_program(mesh: Mesh, axis: str, shard_rows: int, limit: int):
    """Build + jit the shard_map match once per (mesh, rows, limit) — the
    same retrace-avoidance discipline as parallel/sharded.py (an eager
    shard_map costs ~2.7s/call through the TPU tunnel)."""

    local_k = min(limit, shard_rows)

    def local(q_ids, e_ids, t_ids, c_ids, valid, qm, em, tm, cm):
        shard = jax.lax.axis_index(axis)
        base = shard * shard_rows
        hit = (
            _mask_lookup(qm, q_ids)
            & _mask_lookup(em, e_ids)
            & _mask_lookup(tm, t_ids)
            & _mask_lookup(cm, c_ids)
            & valid
        )
        # Global CSR rank as the selection key (earlier row = higher score);
        # int32 keys are exact at any fact count (graph_index._match_kernel).
        row_idx = base + jnp.arange(shard_rows, dtype=jnp.int32)
        score = jnp.where(hit, -row_idx, _RANK_MISS)
        top_scores, top_local = jax.lax.top_k(score, local_k)
        top_rows = (top_local + base).astype(jnp.int32)
        # Candidate merge rides ICI: P*k (rank, row) pairs per match.
        cand_s = jax.lax.all_gather(top_scores, axis, axis=0, tiled=True)
        cand_r = jax.lax.all_gather(top_rows, axis, axis=0, tiled=True)
        kk = min(limit, cand_s.shape[0])
        merged_s, sel = jax.lax.top_k(cand_s, kk)
        merged_rows = cand_r[sel]
        count = jax.lax.psum(jnp.sum(hit.astype(jnp.int32)), axis)
        return merged_rows, merged_s != _RANK_MISS, count

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedGraphIndex:
    """Mesh-sharded read view over a built :class:`GraphIndex`.

    Mirrors ``GraphIndex.match`` semantics (quarters/names/types/companies
    masks, limit, CSR result order, reference Cypher result-dict shapes)
    with the fact table partitioned across devices. The host-side vocab,
    metadata sidecar, and result materialization stay on the wrapped graph.
    """

    def __init__(self, graph, mesh: Optional[Mesh] = None, axis: str = "shards"):
        self.graph = graph
        self.mesh = mesh or make_mesh(axis_name=axis)
        self.axis = axis
        packed = graph._pack()
        n_dev = self.mesh.shape[axis]
        total = int(packed["quarter_ids"].shape[0])
        self.n_rows = int(packed["n"])
        # Re-pad so rows split evenly across devices (graph _PAD=128 need
        # not divide by the mesh size).
        self.total = -(-total // n_dev) * n_dev
        self.shard_rows = self.total // n_dev
        pad = self.total - total
        sharding = NamedSharding(self.mesh, P(axis))

        def place(arr, default):
            host = np.asarray(arr)
            if pad:
                host = np.concatenate([host, np.full((pad,), default, host.dtype)])
            return jax.device_put(host, sharding)

        self.quarter_ids = place(packed["quarter_ids"], 0)
        self.entity_ids = place(packed["entity_ids"], 0)
        self.type_ids = place(packed["type_ids"], 0)
        self.company_ids = place(packed["company_ids"], 0)
        self.row_valid = place(packed["row_valid"], False)

    def _company_mask(self, companies: Optional[Sequence[str]]) -> jnp.ndarray:
        n = max(len(self.graph._companies), 1)
        cm = np.zeros((n,), bool)
        if not companies:
            cm[:] = True
        else:
            for c in companies:
                ci = self.graph._company_id_of.get(c)
                if ci is not None:
                    cm[ci] = True
        return jnp.asarray(cm)

    def match_rows(
        self,
        quarters: Optional[Sequence[str]] = None,
        names: Optional[Sequence[str]] = None,
        types: Optional[Sequence[int]] = None,
        limit: int = 30,
        companies: Optional[Sequence[str]] = None,
    ):
        """(top_rows, valid, count) replicated device arrays."""
        qm, em, tm = self.graph._masks(quarters, names, types)
        cm = self._company_mask(companies)
        program = _sharded_match_program(self.mesh, self.axis, self.shard_rows, limit)
        return program(
            self.quarter_ids, self.entity_ids, self.type_ids, self.company_ids,
            self.row_valid, qm, em, tm, cm,
        )

    def match(
        self,
        quarters: Optional[Sequence[str]] = None,
        names: Optional[Sequence[str]] = None,
        types: Optional[Sequence[int]] = None,
        limit: int = 30,
        companies: Optional[Sequence[str]] = None,
    ) -> list[dict]:
        packed = self.graph._pack()
        if packed["n"] == 0:
            return []
        top_rows, valid, _count = self.match_rows(
            quarters, names, types, limit=limit, companies=companies
        )
        rows = np.asarray(top_rows)
        ok = np.asarray(valid) & (rows < self.n_rows)
        return self.graph._rows_to_dicts(packed, rows, ok)
