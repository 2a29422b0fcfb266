"""Device-resident knowledge-graph store with masked-gather query kernels (T3).

TPU-native replacement for the reference's Neo4j graph (schema:
Organization-[:HAS_QUARTER]->Quarter-[:HAS_METRIC|HAS_SEGMENT_PERFORMANCE|
HAS_RATIO|HAS_BALANCE_SHEET_ITEM]->typed nodes; ``graph_rag_mcp/services/
neo4j_service.py:21-175``). Design:

- Entity names and quarters map to a fixed integer vocabulary (seeded from
  ``config.constants.FINANCIAL_ENTITY_TYPES``; unseen names grow the vocab).
- Every (quarter → entity) edge with its typed attributes is one row of a
  packed columnar **fact table**: int32 quarter/entity/type columns + float32
  attribute columns, padded to a lane multiple and sorted by (quarter, type,
  entity) — CSR-style with per-quarter row offsets for frontier expansion.
- A query = boolean masks over the quarter/entity/type vocabularies; the
  device kernel scores each fact row (match → 1.0 else -inf, ordered by row
  id) and reuses the exact top-k machinery (:mod:`ragfin_tpu.ops.topk`'s
  extraction pattern via ``lax.top_k``) to compact up to ``limit`` matches —
  the reference's per-strategy Cypher templates (``graph_cons.py:367-472``)
  all lower onto this one kernel with different masks.
- k-hop expansion (entity → quarters → co-entities, the monolith's
  ``traverse_entity_relationships``, ``mcp_graph_rag/graph_rag_tools.py:
  1538-1595``) = two rounds of mask propagation through the fact table.

Graph mutation (save_entities / clear) happens host-side on columnar numpy
buffers; the packed device arrays are re-materialized lazily on first query
after a mutation (append-heavy build, read-heavy serve — same split as the
reference's build vs query phases).
"""

from __future__ import annotations

import functools
import json
import os
import re
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config.constants import FINANCIAL_ENTITY_TYPES, SUPPORTED_QUARTERS
from ..data.models import ExtractedEntities

# Fact types (edge labels of the reference schema).
METRIC, SEGMENT, RATIO, BALANCE = 0, 1, 2, 3
TYPE_NAMES = {METRIC: "Metric", SEGMENT: "Segment", RATIO: "Ratio", BALANCE: "BalanceSheetItem"}
EDGE_NAMES = {
    METRIC: "HAS_METRIC",
    SEGMENT: "HAS_SEGMENT_PERFORMANCE",
    RATIO: "HAS_RATIO",
    BALANCE: "HAS_BALANCE_SHEET_ITEM",
}
_PAD = 128

_PERIOD_RE = re.compile(r"^Q([1-4])_FY(\d{4})$")


def _period_key(period: str):
    """Chronological sort key for ``Q#_FY####`` periods.

    Returns (0, fiscal_year, quarter) for conforming periods so FY2024 Q4
    precedes FY2025 Q1; non-conforming strings sort after, by raw string.
    """
    m = _PERIOD_RE.match(period or "")
    if m:
        return (0, int(m.group(2)), int(m.group(1)), "")
    return (1, 0, 0, period or "")


_RANK_MISS = jnp.int32(-0x80000000)  # sentinel strictly below any -row_idx


@functools.partial(jax.jit, static_argnames=("limit",))
def _match_kernel(
    quarter_ids, entity_ids, type_ids, row_valid,
    quarter_mask, entity_mask, type_mask, limit: int,
):
    """Masked fact selection: returns (match_flags sorted-topk row ids).

    Ranking key is the int32 ``-row_idx`` (earlier rows rank higher), so row
    order is exact for any row count — a float32 key would collapse distinct
    rows past 2^24 (the 10M-chunk scale has multiple facts per chunk). Misses
    get the int32-min sentinel. Results come back in CSR order
    (quarter-major), matching the reference's ``ORDER BY q.name``.
    """
    rows = quarter_ids.shape[0]
    hit = (
        quarter_mask[quarter_ids]
        & entity_mask[entity_ids]
        & type_mask[type_ids]
        & row_valid
    )
    row_idx = jnp.arange(rows, dtype=jnp.int32)
    score = jnp.where(hit, -row_idx, _RANK_MISS)
    k = min(limit, rows)
    top_scores, top_rows = jax.lax.top_k(score, k)
    count = jnp.sum(hit.astype(jnp.int32))
    return top_rows.astype(jnp.int32), top_scores != _RANK_MISS, count


@jax.jit
def _aggregate_kernel(values, quarter_ids, entity_ids, type_ids, row_valid,
                      quarter_mask, entity_mask, type_mask):
    """Masked aggregation over fact values: (argmax row, argmin row, mean).

    Powers peak/trough questions ("which quarter did X peak") as one device
    reduction instead of host-side sorting of match results."""
    hit = (
        quarter_mask[quarter_ids]
        & entity_mask[entity_ids]
        & type_mask[type_ids]
        & row_valid
        & jnp.isfinite(values)
    )
    pos = jnp.where(hit, values, -jnp.inf)
    neg = jnp.where(hit, values, jnp.inf)
    count = jnp.maximum(jnp.sum(hit), 1)
    mean = jnp.sum(jnp.where(hit, values, 0.0)) / count
    return jnp.argmax(pos), jnp.argmin(neg), mean, jnp.sum(hit)


@functools.partial(jax.jit, static_argnames=("n_quarters",))
def _expand_kernel(quarter_ids, entity_ids, type_ids, row_valid, seed_entity_mask, n_quarters: int):
    """1-hop frontier expansion: entities → quarters touching them → all
    facts in those quarters (the co-occurrence traverse of C20)."""
    seed_rows = seed_entity_mask[entity_ids] & row_valid
    frontier_q = jnp.zeros((n_quarters,), bool).at[quarter_ids].max(seed_rows)
    reached = frontier_q[quarter_ids] & row_valid
    return frontier_q, reached


class GraphIndex:
    """Columnar fact store + vocabulary + device query kernels."""

    def __init__(self, company: str = "ICICI Bank"):
        self.company = company
        self.quarters: list[str] = list(SUPPORTED_QUARTERS)
        self.entities: list[str] = []
        self._entity_id: dict[str, int] = {}
        for names in FINANCIAL_ENTITY_TYPES.values():
            for name in names:
                self._intern_entity(name)
        # Host-side columnar buffers (python lists; packed lazily).
        self._rows: list[tuple] = []  # (q, e, t, value, growth, aux, unit, chunk_id, dataset_id)
        self._packed: Optional[dict[str, jax.Array]] = None
        self.organizations: dict[str, set[str]] = {}
        self.quarter_sources: dict[str, list[str]] = {}

    # --- vocabulary ------------------------------------------------------
    def _intern_entity(self, name: str) -> int:
        if name not in self._entity_id:
            self._entity_id[name] = len(self.entities)
            self.entities.append(name)
        return self._entity_id[name]

    def _intern_quarter(self, period: str) -> int:
        if period not in self.quarters:
            self.quarters.append(period)
        return self.quarters.index(period)

    # --- mutation (reference save_entities, neo4j_service.py:48-175) ------
    def save_entities(
        self,
        entities: ExtractedEntities,
        chunk_id: str,
        dataset_id: str = "icici_fy2024",
        company_name: Optional[str] = None,
    ) -> int:
        quarter = entities.quarter
        if not quarter:
            return 0
        company = company_name or self.company
        self.organizations.setdefault(company, set()).add(quarter)
        self.quarter_sources.setdefault(quarter, []).append(chunk_id)
        q = self._intern_quarter(quarter)
        added = 0

        def put(type_id, name, value, growth, aux, unit):
            nonlocal added
            e = self._intern_entity(name)
            self._rows.append((q, e, type_id, value, growth, aux, unit, chunk_id, dataset_id))
            added += 1

        for m in entities.financial_metrics:
            put(METRIC, m.name, m.value, m.growth_yoy, None, m.unit)
        for s in entities.business_segments:
            put(SEGMENT, s.name, s.revenue, None, s.margin, s.percentage_of_total)
        for r in entities.financial_ratios:
            put(RATIO, r.name, r.value, r.growth_yoy, None, r.unit)
        for b in entities.balance_sheet_items:
            put(BALANCE, b.name, b.value, None, b.percentage_of_total, b.unit)
        if added:
            self._packed = None
        return added

    def clear_data(self, dataset_id: Optional[str] = None) -> None:
        """Clear one dataset or everything (reference :234-251)."""
        if dataset_id is None:
            self._rows = []
            self.organizations = {}
            self.quarter_sources = {}
        else:
            self._rows = [r for r in self._rows if r[8] != dataset_id]
        self._packed = None

    # --- packing ----------------------------------------------------------
    def _pack(self) -> dict[str, Any]:
        if self._packed is not None:
            return self._packed
        # CSR order: quarter-major in true chronological order (parsed
        # (fiscal_year, quarter) key — a lexicographic sort on the period
        # string would put Q1_FY2025 before Q4_FY2024), then type, then
        # insertion order. Matches the reference's ``ORDER BY q.period``
        # intent across fiscal years.
        order = sorted(
            range(len(self._rows)),
            key=lambda i: (_period_key(self.quarters[self._rows[i][0]]), self._rows[i][2], i),
        )
        rows = [self._rows[i] for i in order]
        n = len(rows)
        pad = -n % _PAD or _PAD
        total = n + pad

        def col(idx, dtype, default=0):
            arr = np.full((total,), default, dtype)
            for i, r in enumerate(rows):
                v = r[idx]
                arr[i] = default if v is None else v
            return arr

        quarter_ids = col(0, np.int32)
        # CSR row offsets over the chronologically sorted quarter sequence
        # (rows are packed in that order).
        sorted_quarters = sorted(set(self.quarters[r[0]] for r in rows), key=_period_key)
        rank = {q: i for i, q in enumerate(sorted_quarters)}
        offsets = np.zeros((len(sorted_quarters) + 1,), np.int32)
        for r in rows:
            offsets[rank[self.quarters[r[0]]] + 1] += 1
        offsets = np.cumsum(offsets).astype(np.int32)

        self._packed = {
            "quarter_ids": jnp.asarray(quarter_ids),
            "entity_ids": jnp.asarray(col(1, np.int32)),
            "type_ids": jnp.asarray(col(2, np.int32)),
            "value": jnp.asarray(col(3, np.float32, np.nan)),
            "growth": jnp.asarray(col(4, np.float32, np.nan)),
            "aux": jnp.asarray(col(5, np.float32, np.nan)),
            "row_valid": jnp.asarray(np.arange(total) < n),
            "quarter_offsets": jnp.asarray(offsets),
            "sorted_quarters": sorted_quarters,
            "rows": rows,  # host sidecar (unit, chunk, dataset strings)
            "n": n,
        }
        return self._packed

    # --- queries ----------------------------------------------------------
    def _masks(self, quarters: Optional[Sequence[str]], names: Optional[Sequence[str]], types: Optional[Sequence[int]]):
        nq, ne = len(self.quarters), len(self.entities)
        qm = np.zeros((nq,), bool)
        if quarters:
            for q in quarters:
                if q in self.quarters:
                    qm[self.quarters.index(q)] = True
        else:
            qm[:] = True
        em = np.zeros((ne,), bool)
        if names:
            for name in names:
                if name in self._entity_id:
                    em[self._entity_id[name]] = True
        else:
            em[:] = True
        tm = np.zeros((4,), bool)
        if types:
            for t in types:
                tm[t] = True
        else:
            tm[:] = True
        return jnp.asarray(qm), jnp.asarray(em), jnp.asarray(tm)

    def match(
        self,
        quarters: Optional[Sequence[str]] = None,
        names: Optional[Sequence[str]] = None,
        types: Optional[Sequence[int]] = None,
        limit: int = 30,
    ) -> list[dict]:
        """Masked fact selection → result rows in the reference's Cypher
        result-dict shapes (graph_cons.py:371-456)."""
        packed = self._pack()
        if packed["n"] == 0:
            return []
        qm, em, tm = self._masks(quarters, names, types)
        top_rows, valid, _count = _match_kernel(
            packed["quarter_ids"], packed["entity_ids"], packed["type_ids"],
            packed["row_valid"], qm, em, tm, limit,
        )
        return self._rows_to_dicts(packed, np.asarray(top_rows), np.asarray(valid))

    def aggregate(
        self,
        names: Optional[Sequence[str]] = None,
        quarters: Optional[Sequence[str]] = None,
        types: Optional[Sequence[int]] = None,
        field: str = "value",
    ) -> Optional[dict]:
        """Masked min/max/mean over a fact attribute ('value'|'growth'|'aux').

        Returns {"max": row-dict, "min": row-dict, "mean": float, "count"} or
        None when nothing matches — e.g. peak-margin-quarter questions use
        field="aux" over SEGMENT facts."""
        packed = self._pack()
        if packed["n"] == 0:
            return None
        qm, em, tm = self._masks(quarters, names, types)
        argmax, argmin, mean, count = _aggregate_kernel(
            packed[field], packed["quarter_ids"], packed["entity_ids"], packed["type_ids"],
            packed["row_valid"], qm, em, tm,
        )
        if int(count) == 0:
            return None
        rows = self._rows_to_dicts(
            packed, np.asarray([int(argmax), int(argmin)]), np.asarray([True, True])
        )
        return {"max": rows[0], "min": rows[1] if len(rows) > 1 else rows[0],
                "mean": float(mean), "count": int(count), "field": field}

    def expand(self, names: Sequence[str], limit: int = 30) -> list[dict]:
        """1-hop co-occurrence expansion from entity names (C20 traverse)."""
        packed = self._pack()
        if packed["n"] == 0:
            return []
        ne = len(self.entities)
        em = np.zeros((ne,), bool)
        for name in names:
            if name in self._entity_id:
                em[self._entity_id[name]] = True
        frontier_q, reached = _expand_kernel(
            packed["quarter_ids"], packed["entity_ids"], packed["type_ids"],
            packed["row_valid"], jnp.asarray(em), len(self.quarters),
        )
        reached = np.asarray(reached)
        rows = np.nonzero(reached)[0][:limit]
        return self._rows_to_dicts(packed, rows, np.ones_like(rows, bool))

    def _rows_to_dicts(self, packed, row_ids, valid) -> list[dict]:
        out = []
        rows = packed["rows"]
        for rid, ok in zip(row_ids, valid):
            if not ok or rid >= packed["n"]:
                continue
            q, e, t, value, growth, aux, unit, chunk_id, dataset_id = rows[int(rid)]
            quarter = self.quarters[q]
            name = self.entities[e]
            if t == METRIC:
                out.append({"quarter": quarter, "metric_name": name, "value": value,
                            "growth": growth, "unit": unit, "source_chunk": chunk_id})
            elif t == SEGMENT:
                out.append({"quarter": quarter, "segment_name": name, "revenue": value,
                            "margin": aux, "source_chunk": chunk_id})
            elif t == RATIO:
                out.append({"quarter": quarter, "ratio_name": name, "value": value,
                            "growth": growth, "unit": unit, "source_chunk": chunk_id})
            else:
                out.append({"quarter": quarter, "item_name": name, "value": value,
                            "percentage_of_total": aux, "unit": unit, "source_chunk": chunk_id})
        return out

    # --- stats (reference get_stats, neo4j_service.py:187-232) -------------
    def stats(self) -> dict:
        by_type: dict[str, int] = {name + "_count": 0 for name in TYPE_NAMES.values()}
        detailed: dict[str, dict[str, int]] = {}
        quarters_present = set()
        for q, e, t, *_ in self._rows:
            quarter = self.quarters[q]
            quarters_present.add(quarter)
            by_type[TYPE_NAMES[t] + "_count"] += 1
            d = detailed.setdefault(quarter, {"metrics": 0, "segments": 0, "ratios": 0, "balance_items": 0})
            d[{METRIC: "metrics", SEGMENT: "segments", RATIO: "ratios", BALANCE: "balance_items"}[t]] += 1
        return {
            "Organization_count": len(self.organizations),
            "Quarter_count": len(quarters_present),
            **by_type,
            "quarters_available": sorted(quarters_present),
            "detailed_counts": dict(sorted(detailed.items())),
            "total_facts": len(self._rows),
        }

    def health_check(self) -> bool:
        return True

    # --- persistence ------------------------------------------------------
    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "graph.json"), "w") as f:
            json.dump(
                {
                    "company": self.company,
                    "quarters": self.quarters,
                    "entities": self.entities,
                    "rows": self._rows,
                    "organizations": {k: sorted(v) for k, v in self.organizations.items()},
                    "quarter_sources": self.quarter_sources,
                },
                f,
                ensure_ascii=False,
            )

    @classmethod
    def load(cls, directory: str) -> "GraphIndex":
        with open(os.path.join(directory, "graph.json")) as f:
            data = json.load(f)
        g = cls(company=data.get("company", "ICICI Bank"))
        g.quarters = data["quarters"]
        g.entities = data["entities"]
        g._entity_id = {name: i for i, name in enumerate(g.entities)}
        g._rows = [tuple(r) for r in data["rows"]]
        g.organizations = {k: set(v) for k, v in data.get("organizations", {}).items()}
        g.quarter_sources = data.get("quarter_sources", {})
        return g
