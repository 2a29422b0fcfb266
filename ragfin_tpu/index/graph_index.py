"""Device-resident knowledge-graph store with masked-gather query kernels (T3).

TPU-native replacement for the reference's Neo4j graph (schema:
Organization-[:HAS_QUARTER]->Quarter-[:HAS_METRIC|HAS_SEGMENT_PERFORMANCE|
HAS_RATIO|HAS_BALANCE_SHEET_ITEM]->typed nodes; ``graph_rag_mcp/services/
neo4j_service.py:21-175``). Design:

- Entity names and quarters map to a fixed integer vocabulary (seeded from
  ``config.constants.FINANCIAL_ENTITY_TYPES``; unseen names grow the vocab).
- Every (quarter → entity) edge with its typed attributes is one row of a
  packed columnar **fact table**: int32 quarter/entity/type columns + float32
  attribute columns, padded to a lane multiple and sorted by (quarter, type)
  with stable insertion order within a group — CSR-style quarter-major
  ordering (the reference's ORDER BY q.period).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
_INT_MAX = 0x7FFFFFFF


_SUBLANES = 8


def _first_k_kernel(hit_ref, out_ids_ref, out_cnt_ref, acc_ids, acc_cnt, *, k: int, block_n: int):
    """Pallas streaming first-k: walk [8, TN/8] tiles of the hit vector in
    row order, extracting hit row-ids until k are found. Facts are CSR-sorted
    (quarter-major), so the first k hits ARE the top-k under the reference's
    ``ORDER BY q.period`` — no sort materialized (``lax.top_k`` at 10M rows
    would full-sort the fact table per query). Tiles after the kth hit cost
    one vector compare each. Extraction is a min-reduction over linear
    indices (Mosaic has no bool argmax, and 1×N i1 vectors hit layout bugs —
    hence the 8-sublane tile shape and index arithmetic)."""
    j = pl.program_id(0)
    lanes = block_n // _SUBLANES

    @pl.when(j == 0)
    def _init():
        acc_ids[:] = jnp.full_like(acc_ids, _INT_MAX)
        acc_cnt[0] = 0

    cnt0 = acc_cnt[0]

    @pl.when(cnt0 < k)
    def _scan():
        h = hit_ref[:] != 0  # [8, lanes]
        base = j * block_n
        row = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
        lin = row * lanes + col  # position within the tile, row-major
        # Loop-INVARIANT hit positions: Mosaic cannot legalize while-loops
        # that carry large i1 vectors, so the loop carries only scalars and
        # the small accumulator; "next hit" = min position greater than the
        # last one extracted.
        hit_lin = jnp.where(h, lin, _INT_MAX)  # i32 [8, lanes]
        slot = jax.lax.broadcasted_iota(jnp.int32, acc_ids.shape, 1)  # [1, k]

        def cond(st):
            cnt, _, best = st
            return jnp.logical_and(cnt < k, best < _INT_MAX)

        def body(st):
            cnt, acc, best = st
            acc = jnp.where(slot == cnt, base + best, acc)
            nxt = jnp.min(jnp.where(hit_lin > best, hit_lin, _INT_MAX))
            return cnt + 1, acc, nxt

        first = jnp.min(hit_lin)
        cnt2, acc2, _ = jax.lax.while_loop(cond, body, (cnt0, acc_ids[:], first))
        acc_ids[:] = acc2
        acc_cnt[0] = cnt2

    @pl.when(j == pl.num_programs(0) - 1)
    def _flush():
        out_ids_ref[:] = acc_ids[:]
        # Full-block store: Mosaic cannot store scalars to VMEM outputs.
        out_cnt_ref[:] = jnp.full((1, 1), acc_cnt[0], jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "block_n", "interpret"))
def masked_first_k(hit: jax.Array, k: int, block_n: int = 131072, interpret: bool = False):
    """First-k indices of a [N] int8/bool hit vector, via the streaming
    Pallas kernel. Returns (ids [k] int32 with INT_MAX padding, count)."""
    n = hit.shape[0]
    pad = -n % block_n
    h = hit.astype(jnp.int8)
    if pad:
        h = jnp.pad(h, ((0, pad),))
    n_tiles = h.shape[0] // block_n
    # Tile j occupies rows [8j, 8j+8) of the row-major [tiles*8, block_n/8]
    # view — contiguous with the original order.
    h = jnp.reshape(h, (n_tiles * _SUBLANES, block_n // _SUBLANES))
    out_ids, out_cnt = pl.pallas_call(
        functools.partial(_first_k_kernel, k=k, block_n=block_n),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((_SUBLANES, block_n // _SUBLANES), lambda j: (j, 0))],
        out_specs=[
            pl.BlockSpec((1, k), lambda j: (0, 0)),
            pl.BlockSpec((1, 1), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, k), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, k), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(h)
    return out_ids[0], out_cnt[0, 0]


# Above this many 32-bit words (= vocab 1024) the unrolled select chain in
# _mask_lookup stops paying for itself; fall back to the plain gather.
_BITPACK_MAX_WORDS = 32


def _mask_lookup(mask: jax.Array, ids: jax.Array) -> jax.Array:
    """``mask[ids]`` without a device gather.

    A TPU gather of 10M indices from even a 28-entry table measured
    ~33 ms PER TABLE (graph_attrib2 probe: the 3-gather predicate cost
    97.9 ms of the 98 ms 10M-fact match; the Pallas first-k was 3.9 ms).
    Vocabularies here are tiny (quarters/types tens, entities hundreds),
    so pack the mask into ceil(V/32) uint32 words and resolve each id with
    pure elementwise arithmetic — a shift + AND, plus an unrolled scalar
    select chain to pick the word (XLA fuses the chain into the same
    elementwise pass). Falls back to the gather for huge vocabularies."""
    v = int(mask.shape[0])
    n_words = -(-v // 32)
    if n_words > _BITPACK_MAX_WORDS:
        return mask[ids]
    padded = jnp.pad(mask.astype(jnp.uint32), (0, n_words * 32 - v))
    words = jnp.sum(
        padded.reshape(n_words, 32) << jnp.arange(32, dtype=jnp.uint32)[None, :],
        axis=1,
        dtype=jnp.uint32,
    )
    bit = jnp.bitwise_and(ids, 31).astype(jnp.uint32)
    if n_words == 1:
        word = words[0]
    else:
        wi = jax.lax.shift_right_logical(ids, 5)
        word = jnp.zeros(ids.shape, jnp.uint32)
        for w in range(n_words):
            word = jnp.where(wi == w, words[w], word)
    return ((word >> bit) & jnp.uint32(1)).astype(bool)


def _scatter_any(ids: jax.Array, hit: jax.Array, size: int) -> jax.Array:
    """``zeros(size).at[ids].max(hit)`` without a device scatter.

    A TPU scatter-max of 10M rows into even a 28-entry table costs ~90 ms
    (khop probe: two hops of mask propagation measured 357 ms with the
    scatters left in). Each row's hit becomes a single bit flag
    ``1 << (id % 32)`` routed to word ``id // 32``; a bitwise-OR
    lax.reduce per word collapses 10M rows into ceil(size/32) uint32
    words — pure elementwise passes + monoid reductions, no scatter.
    Falls back to the scatter for huge vocabularies."""
    n_words = -(-size // 32)
    if n_words > _BITPACK_MAX_WORDS:
        return jnp.zeros((size,), bool).at[ids].max(hit)
    bit = jnp.bitwise_and(ids, 31).astype(jnp.uint32)
    flags = jnp.where(hit, jnp.uint32(1) << bit, jnp.uint32(0))
    wi = jax.lax.shift_right_logical(ids, 5)
    words = []
    for w in range(n_words):
        contrib = flags if n_words == 1 else jnp.where(wi == w, flags, jnp.uint32(0))
        words.append(
            jax.lax.reduce(contrib, jnp.uint32(0), jax.lax.bitwise_or, (0,))
        )
    packed = jnp.stack(words)
    out = jnp.arange(size, dtype=jnp.uint32)
    return ((packed[out >> 5] >> (out & 31)) & jnp.uint32(1)).astype(bool)


def _predicate(quarter_ids, entity_ids, type_ids, row_valid, quarter_mask, entity_mask, type_mask):
    """Masked fact predicate (the Cypher WHERE clause) — the single source of
    truth shared by :func:`_hit_vector`, :func:`_match_kernel` and
    :func:`_aggregate_kernel` (inlined under their jit). Mask lookups are
    gather-free (:func:`_mask_lookup`) — the difference between a ~98 ms
    and a ~5 ms match at 10M facts."""
    return (
        _mask_lookup(quarter_mask, quarter_ids)
        & _mask_lookup(entity_mask, entity_ids)
        & _mask_lookup(type_mask, type_ids)
        & row_valid
    )


@jax.jit
def _hit_vector(quarter_ids, entity_ids, type_ids, row_valid, quarter_mask, entity_mask, type_mask):
    """Masked fact predicate, one vectorized pass."""
    return _predicate(
        quarter_ids, entity_ids, type_ids, row_valid, quarter_mask, entity_mask, type_mask
    )


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
    hit = _predicate(
        quarter_ids, entity_ids, type_ids, row_valid, quarter_mask, entity_mask, type_mask
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
    hit = _predicate(
        quarter_ids, entity_ids, type_ids, row_valid, quarter_mask, entity_mask, type_mask
    ) & jnp.isfinite(values)
    pos = jnp.where(hit, values, -jnp.inf)
    neg = jnp.where(hit, values, jnp.inf)
    count = jnp.maximum(jnp.sum(hit), 1)
    mean = jnp.sum(jnp.where(hit, values, 0.0)) / count
    return jnp.argmax(pos), jnp.argmin(neg), mean, jnp.sum(hit)


@functools.partial(jax.jit, static_argnames=("n_quarters", "n_entities", "hops"))
def _khop_kernel(
    quarter_ids, entity_ids, row_valid, seed_entity_mask,
    n_quarters: int, n_entities: int, hops: int,
):
    """k-hop frontier expansion by iterated mask propagation through the
    fact table (the co-occurrence traverse of C20, generalized to k hops —
    round-1 verdict #5). One hop = seed entities → quarters touching them;
    each further hop adds the entities co-occurring in reached quarters and
    then their quarters. Each propagation is one scatter-max over the fact
    rows — linear passes, no host loop, k static for unrolling."""

    def step(_, masks):
        e_mask, q_mask = masks
        # Both directions are gather/scatter-free: _mask_lookup resolves
        # mask[ids] with bit arithmetic (~33 ms/10M-index gather avoided)
        # and _scatter_any collapses row hits into the small vocab mask
        # with bitwise-OR reductions (~90 ms/10M-row scatter avoided).
        q_hit = _scatter_any(
            quarter_ids, _mask_lookup(e_mask, entity_ids) & row_valid, n_quarters
        )
        q_mask = q_mask | q_hit
        e_hit = _scatter_any(
            entity_ids, _mask_lookup(q_mask, quarter_ids) & row_valid, n_entities
        )
        e_mask = e_mask | e_hit
        return e_mask, q_mask

    e_mask, q_mask = jax.lax.fori_loop(
        0, hops, step, (seed_entity_mask, jnp.zeros((n_quarters,), bool))
    )
    reached = _mask_lookup(q_mask, quarter_ids) & row_valid
    return q_mask, e_mask, reached


class GraphIndex:
    """Columnar fact store + vocabulary + device query kernels."""

    # Numeric fact columns (SoA). String attributes are interned into
    # per-column vocabularies so a 10M-fact store is ~9 int/float numpy
    # columns, not 10M python tuples.
    _NUM_COLS = ("quarter_ids", "entity_ids", "type_ids", "value", "growth", "aux")
    _STR_COLS = ("unit_ids", "chunk_ids", "dataset_ids", "company_ids")

    def __init__(self, company: str = "ICICI Bank"):
        self.company = company
        self.quarters: list[str] = list(SUPPORTED_QUARTERS)
        self._quarter_id: dict[str, int] = {q: i for i, q in enumerate(self.quarters)}
        self.entities: list[str] = []
        self._entity_id: dict[str, int] = {}
        for names in FINANCIAL_ENTITY_TYPES.values():
            for name in names:
                self._intern_entity(name)
        # String-attribute vocabularies (unit / source chunk / dataset).
        self._units: list[str] = [""]
        self._unit_id: dict[str, int] = {"": 0}
        self._chunks: list[str] = [""]
        self._chunk_id_of: dict[str, int] = {"": 0}
        self._datasets: list[str] = [""]
        self._dataset_id_of: dict[str, int] = {"": 0}
        # Company vocab (reference: quarters live under an Organization
        # node; without a per-fact company a multi-company graph conflates
        # banks at query time). Slot 0 = the default company.
        self._companies: list[str] = [company]
        self._company_id_of: dict[str, int] = {company: 0}
        # Consolidated columnar store + small append buffer.
        self._cols: dict[str, np.ndarray] = self._empty_cols()
        self._pending: list[tuple] = []
        self._packed: Optional[dict[str, Any]] = None
        self.organizations: dict[str, set[str]] = {}
        self.quarter_sources: dict[str, list[str]] = {}

    @classmethod
    def _empty_cols(cls) -> dict[str, np.ndarray]:
        return {
            "quarter_ids": np.zeros((0,), np.int32),
            "entity_ids": np.zeros((0,), np.int32),
            "type_ids": np.zeros((0,), np.int32),
            "value": np.zeros((0,), np.float32),
            "growth": np.zeros((0,), np.float32),
            "aux": np.zeros((0,), np.float32),
            "unit_ids": np.zeros((0,), np.int32),
            "chunk_ids": np.zeros((0,), np.int32),
            "dataset_ids": np.zeros((0,), np.int32),
            "company_ids": np.zeros((0,), np.int32),
        }

    # --- vocabulary ------------------------------------------------------
    def _intern_entity(self, name: str) -> int:
        if name not in self._entity_id:
            self._entity_id[name] = len(self.entities)
            self.entities.append(name)
        return self._entity_id[name]

    def _intern_quarter(self, period: str) -> int:
        if period not in self._quarter_id:
            self._quarter_id[period] = len(self.quarters)
            self.quarters.append(period)
        return self._quarter_id[period]

    @staticmethod
    def _intern(vocab: list, index: dict, value: str) -> int:
        if value not in index:
            index[value] = len(vocab)
            vocab.append(value)
        return index[value]

    def intern_entities(self, names: Sequence[str]) -> np.ndarray:
        return np.array([self._intern_entity(n) for n in names], np.int32)

    def intern_quarters(self, periods: Sequence[str]) -> np.ndarray:
        return np.array([self._intern_quarter(p) for p in periods], np.int32)

    @property
    def n_facts(self) -> int:
        return int(self._cols["quarter_ids"].shape[0]) + len(self._pending)

    def _consolidate(self) -> None:
        """Fold the append buffer into the numpy columns."""
        if not self._pending:
            return
        pend = list(zip(*self._pending))
        new = {
            "quarter_ids": np.asarray(pend[0], np.int32),
            "entity_ids": np.asarray(pend[1], np.int32),
            "type_ids": np.asarray(pend[2], np.int32),
            "value": np.asarray([np.nan if v is None else v for v in pend[3]], np.float32),
            "growth": np.asarray([np.nan if v is None else v for v in pend[4]], np.float32),
            "aux": np.asarray([np.nan if v is None else v for v in pend[5]], np.float32),
            "unit_ids": np.asarray(pend[6], np.int32),
            "chunk_ids": np.asarray(pend[7], np.int32),
            "dataset_ids": np.asarray(pend[8], np.int32),
            "company_ids": np.asarray(pend[9], np.int32),
        }
        self._cols = {k: np.concatenate([self._cols[k], new[k]]) for k in self._cols}
        self._pending = []

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
        sources = self.quarter_sources.setdefault(quarter, [])
        if chunk_id not in sources:  # rebuilds must not duplicate sources
            sources.append(chunk_id)
        q = self._intern_quarter(quarter)
        added = 0

        cid = self._intern(self._chunks, self._chunk_id_of, chunk_id)
        did = self._intern(self._datasets, self._dataset_id_of, dataset_id)
        coid = self._intern(self._companies, self._company_id_of, company)

        def put(type_id, name, value, growth, aux, unit):
            nonlocal added
            e = self._intern_entity(name)
            uid = self._intern(self._units, self._unit_id, unit or "")
            self._pending.append((q, e, type_id, value, growth, aux, uid, cid, did, coid))
            added += 1

        for m in entities.financial_metrics:
            put(METRIC, m.name, m.value, m.growth_yoy, None, m.unit)
        for s in entities.business_segments:
            # Segments have no YoY-growth field, so the growth column carries
            # percentage_of_total (a float does not belong in the unit vocab).
            put(SEGMENT, s.name, s.revenue, s.percentage_of_total, s.margin, None)
        for r in entities.financial_ratios:
            put(RATIO, r.name, r.value, r.growth_yoy, None, r.unit)
        for b in entities.balance_sheet_items:
            put(BALANCE, b.name, b.value, None, b.percentage_of_total, b.unit)
        if added:
            self._packed = None
        return added

    def add_facts_bulk(
        self,
        quarter_ids: np.ndarray,
        entity_ids: np.ndarray,
        type_ids: np.ndarray,
        values: np.ndarray,
        growth: Optional[np.ndarray] = None,
        aux: Optional[np.ndarray] = None,
        unit: str = "crore",
        chunk_id: str = "bulk",
        dataset_id: str = "bulk",
        company: Optional[str] = None,
    ) -> int:
        """Columnar bulk ingestion (the 10M-fact scale path): numpy arrays of
        pre-interned vocab ids (see :meth:`intern_quarters` /
        :meth:`intern_entities`) appended as one concatenate — no per-fact
        Python loop."""
        self._consolidate()
        n = int(quarter_ids.shape[0])
        uid = self._intern(self._units, self._unit_id, unit)
        cid = self._intern(self._chunks, self._chunk_id_of, chunk_id)
        did = self._intern(self._datasets, self._dataset_id_of, dataset_id)
        nan = np.full((n,), np.nan, np.float32)
        new = {
            "quarter_ids": np.asarray(quarter_ids, np.int32),
            "entity_ids": np.asarray(entity_ids, np.int32),
            "type_ids": np.asarray(type_ids, np.int32),
            "value": np.asarray(values, np.float32),
            "growth": nan if growth is None else np.asarray(growth, np.float32),
            "aux": nan if aux is None else np.asarray(aux, np.float32),
            "unit_ids": np.full((n,), uid, np.int32),
            "chunk_ids": np.full((n,), cid, np.int32),
            "dataset_ids": np.full((n,), did, np.int32),
            "company_ids": np.full(
                (n,),
                self._intern(self._companies, self._company_id_of, company or self.company),
                np.int32,
            ),
        }
        self._cols = {k: np.concatenate([self._cols[k], new[k]]) for k in self._cols}
        self._packed = None
        return n

    def clear_data(self, dataset_id: Optional[str] = None) -> None:
        """Clear one dataset or everything (reference :234-251)."""
        if dataset_id is None:
            self._cols = self._empty_cols()
            self._pending = []
            self.organizations = {}
            self.quarter_sources = {}
        else:
            self._consolidate()
            did = self._dataset_id_of.get(dataset_id)
            if did is not None:
                keep = self._cols["dataset_ids"] != did
                self._cols = {k: v[keep] for k, v in self._cols.items()}
                # Reference clear semantics remove the org/quarter nodes
                # too — rebuild the host-side views from surviving rows so
                # stats() does not report cleared data.
                self.organizations = {}
                self.quarter_sources = {}
                for qi, ci, coi in zip(
                    self._cols["quarter_ids"], self._cols["chunk_ids"],
                    self._cols["company_ids"],
                ):
                    quarter = self.quarters[int(qi)]
                    self.organizations.setdefault(
                        self._companies[int(coi)], set()
                    ).add(quarter)
                    chunk = self._chunks[int(ci)]
                    sources = self.quarter_sources.setdefault(quarter, [])
                    if chunk and chunk not in sources:
                        sources.append(chunk)
        self._packed = None

    # --- packing ----------------------------------------------------------
    def _pack(self) -> dict[str, Any]:
        if self._packed is not None:
            return self._packed
        self._consolidate()
        cols = self._cols
        n = int(cols["quarter_ids"].shape[0])
        # CSR order: quarter-major in true chronological order (parsed
        # (fiscal_year, quarter) key — a lexicographic sort on the period
        # string would put Q1_FY2025 before Q4_FY2024), then type, then
        # insertion order. Matches the reference's ``ORDER BY q.period``
        # intent across fiscal years. Vectorized: np.lexsort over the
        # chronological quarter rank (sort is stable, preserving insertion
        # order within (quarter, type)).
        chrono = sorted(range(len(self.quarters)), key=lambda i: _period_key(self.quarters[i]))
        rank_of = np.zeros((len(self.quarters),), np.int64)
        for r, qi in enumerate(chrono):
            rank_of[qi] = r
        qrank = rank_of[cols["quarter_ids"]]
        order = np.lexsort((cols["type_ids"], qrank))  # stable; minor key first
        sorted_cols = {k: v[order] for k, v in cols.items()}

        pad = -n % _PAD or _PAD
        total = n + pad

        def padded(arr, default):
            out = np.full((total,), default, arr.dtype)
            out[:n] = arr
            return out

        self._packed = {
            "quarter_ids": jnp.asarray(padded(sorted_cols["quarter_ids"], 0)),
            "entity_ids": jnp.asarray(padded(sorted_cols["entity_ids"], 0)),
            "type_ids": jnp.asarray(padded(sorted_cols["type_ids"], 0)),
            "value": jnp.asarray(padded(sorted_cols["value"], np.nan)),
            "growth": jnp.asarray(padded(sorted_cols["growth"], np.nan)),
            "aux": jnp.asarray(padded(sorted_cols["aux"], np.nan)),
            "company_ids": jnp.asarray(padded(sorted_cols["company_ids"], 0)),
            "row_valid": jnp.asarray(np.arange(total) < n),
            # Host sidecar: sorted numpy columns for result materialization.
            "host": sorted_cols,
            "n": n,
        }
        return self._packed

    # --- queries ----------------------------------------------------------
    def _scoped_valid(self, packed, companies: Optional[Sequence[str]]):
        """row_valid ∧ company scope. The fact table carries a per-row
        company id (the reference scopes quarters under an Organization
        node); without this, a multi-company graph would conflate banks in
        match/aggregate results."""
        rv = packed["row_valid"]
        if not companies:
            return rv
        cm = np.zeros((len(self._companies),), bool)
        for c in companies:
            ci = self._company_id_of.get(c)
            if ci is not None:
                cm[ci] = True
        # Gather-free lookup (same ~33 ms/10M-index gather cost as the
        # predicate masks — see _mask_lookup).
        return rv & _mask_lookup(jnp.asarray(cm), packed["company_ids"])

    def _masks(self, quarters: Optional[Sequence[str]], names: Optional[Sequence[str]], types: Optional[Sequence[int]]):
        nq, ne = len(self.quarters), len(self.entities)
        qm = np.zeros((nq,), bool)
        if quarters:
            for q in quarters:
                qid = self._quarter_id.get(q)
                if qid is not None and qid < nq:
                    qm[qid] = True
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
        companies: Optional[Sequence[str]] = None,
    ) -> list[dict]:
        """Masked fact selection → result rows in the reference's Cypher
        result-dict shapes (graph_cons.py:371-456)."""
        packed = self._pack()
        if packed["n"] == 0:
            return []
        qm, em, tm = self._masks(quarters, names, types)
        row_valid = self._scoped_valid(packed, companies)
        total = int(packed["quarter_ids"].shape[0])
        if total >= (1 << 18):
            # Scale path: one vectorized predicate pass + streaming Pallas
            # first-k (CSR order makes first-k == top-k) — no 10M-row sort.
            hit = _hit_vector(
                packed["quarter_ids"], packed["entity_ids"], packed["type_ids"],
                row_valid, qm, em, tm,
            )
            ids, _cnt = masked_first_k(
                hit, min(limit, total), interpret=jax.default_backend() != "tpu"
            )
            ids = np.asarray(ids)
            return self._rows_to_dicts(packed, ids, ids < packed["n"])
        top_rows, valid, _count = _match_kernel(
            packed["quarter_ids"], packed["entity_ids"], packed["type_ids"],
            row_valid, qm, em, tm, limit,
        )
        return self._rows_to_dicts(packed, np.asarray(top_rows), np.asarray(valid))

    def aggregate(
        self,
        names: Optional[Sequence[str]] = None,
        quarters: Optional[Sequence[str]] = None,
        types: Optional[Sequence[int]] = None,
        field: str = "value",
        companies: Optional[Sequence[str]] = None,
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
            self._scoped_valid(packed, companies), qm, em, tm,
        )
        if int(count) == 0:
            return None
        rows = self._rows_to_dicts(
            packed, np.asarray([int(argmax), int(argmin)]), np.asarray([True, True])
        )
        return {"max": rows[0], "min": rows[1] if len(rows) > 1 else rows[0],
                "mean": float(mean), "count": int(count), "field": field}

    def expand(self, names: Sequence[str], limit: int = 30, hops: int = 1) -> list[dict]:
        """k-hop co-occurrence expansion from entity names (C20 traverse,
        ``mcp_graph_rag/graph_rag_tools.py:1538-1595``, generalized)."""
        packed = self._pack()
        if packed["n"] == 0:
            return []
        ne = len(self.entities)
        em = np.zeros((ne,), bool)
        for name in names:
            if name in self._entity_id:
                em[self._entity_id[name]] = True
        _q_mask, _e_mask, reached = _khop_kernel(
            packed["quarter_ids"], packed["entity_ids"], packed["row_valid"],
            jnp.asarray(em), len(self.quarters), ne, int(hops),
        )
        reached = np.asarray(reached)
        rows = np.nonzero(reached)[0][:limit]
        return self._rows_to_dicts(packed, rows, np.ones_like(rows, bool))

    def _rows_to_dicts(self, packed, row_ids, valid) -> list[dict]:
        out = []
        host = packed["host"]

        def _opt(x):
            return None if np.isnan(x) else float(x)

        for rid, ok in zip(row_ids, valid):
            if not ok or rid >= packed["n"]:
                continue
            r = int(rid)
            q = int(host["quarter_ids"][r])
            e = int(host["entity_ids"][r])
            t = int(host["type_ids"][r])
            company = self._companies[int(host["company_ids"][r])]
            value = _opt(host["value"][r])
            growth = _opt(host["growth"][r])
            aux = _opt(host["aux"][r])
            unit = self._units[int(host["unit_ids"][r])] or None
            chunk_id = self._chunks[int(host["chunk_ids"][r])]
            quarter = self.quarters[q]
            name = self.entities[e]
            if t == METRIC:
                out.append({"quarter": quarter, "company": company, "metric_name": name, "value": value,
                            "growth": growth, "unit": unit, "source_chunk": chunk_id})
            elif t == SEGMENT:
                out.append({"quarter": quarter, "company": company, "segment_name": name, "revenue": value,
                            "margin": aux, "percentage_of_total": growth,
                            "source_chunk": chunk_id})
            elif t == RATIO:
                out.append({"quarter": quarter, "company": company, "ratio_name": name, "value": value,
                            "growth": growth, "unit": unit, "source_chunk": chunk_id})
            else:
                out.append({"quarter": quarter, "company": company, "item_name": name, "value": value,
                            "percentage_of_total": aux, "unit": unit, "source_chunk": chunk_id})
        return out

    # --- stats (reference get_stats, neo4j_service.py:187-232) -------------
    def stats(self) -> dict:
        self._consolidate()
        q_ids = self._cols["quarter_ids"]
        t_ids = self._cols["type_ids"]
        nq = len(self.quarters)
        type_counts = np.bincount(t_ids, minlength=4)
        by_type = {TYPE_NAMES[t] + "_count": int(type_counts[t]) for t in range(4)}
        # Per-(quarter, type) detail via one bincount over a combined key.
        pair = np.bincount(q_ids.astype(np.int64) * 4 + t_ids, minlength=nq * 4).reshape(nq, 4)
        key = {METRIC: "metrics", SEGMENT: "segments", RATIO: "ratios", BALANCE: "balance_items"}
        detailed = {}
        quarters_present = []
        for qi in np.nonzero(pair.sum(axis=1))[0]:
            quarter = self.quarters[int(qi)]
            quarters_present.append(quarter)
            detailed[quarter] = {key[t]: int(pair[qi, t]) for t in range(4)}
        return {
            "Organization_count": len(self.organizations),
            "Quarter_count": len(quarters_present),
            **by_type,
            "quarters_available": sorted(quarters_present),
            "detailed_counts": dict(sorted(detailed.items())),
            "total_facts": int(q_ids.shape[0]),
        }

    def health_check(self) -> bool:
        return True

    # --- persistence ------------------------------------------------------
    def save(self, directory: str) -> None:
        """Columnar persistence: vocabularies in JSON, fact columns in one
        .npz (scales to 10M facts where a JSON row dump would not)."""
        os.makedirs(directory, exist_ok=True)
        self._consolidate()
        with open(os.path.join(directory, "graph.json"), "w") as f:
            json.dump(
                {
                    "format": 2,
                    "company": self.company,
                    "quarters": self.quarters,
                    "entities": self.entities,
                    "units": self._units,
                    "chunks": self._chunks,
                    "datasets": self._datasets,
                    "companies": self._companies,
                    "organizations": {k: sorted(v) for k, v in self.organizations.items()},
                    "quarter_sources": self.quarter_sources,
                },
                f,
                ensure_ascii=False,
            )
        np.savez_compressed(os.path.join(directory, "graph_facts.npz"), **self._cols)

    @classmethod
    def load(cls, directory: str) -> "GraphIndex":
        with open(os.path.join(directory, "graph.json")) as f:
            data = json.load(f)
        g = cls(company=data.get("company", "ICICI Bank"))
        g.quarters = data["quarters"]
        g._quarter_id = {q: i for i, q in enumerate(g.quarters)}
        g.entities = data["entities"]
        g._entity_id = {name: i for i, name in enumerate(g.entities)}
        g.organizations = {k: set(v) for k, v in data.get("organizations", {}).items()}
        g.quarter_sources = data.get("quarter_sources", {})
        if data.get("format", 1) >= 2:
            for attr, key in (("_units", "units"), ("_chunks", "chunks"), ("_datasets", "datasets")):
                setattr(g, attr, data[key])
            g._unit_id = {u: i for i, u in enumerate(g._units)}
            g._chunk_id_of = {c: i for i, c in enumerate(g._chunks)}
            g._dataset_id_of = {d: i for i, d in enumerate(g._datasets)}
            if "companies" in data:
                g._companies = data["companies"]
                g._company_id_of = {c: i for i, c in enumerate(g._companies)}
            with np.load(os.path.join(directory, "graph_facts.npz")) as z:
                g._cols = {
                    k: (z[k] if k in z
                        else np.zeros(z["quarter_ids"].shape, np.int32))
                    for k in g._cols
                }
        else:
            # Round-1 format: JSON row tuples (q, e, t, value, growth, aux,
            # unit, chunk_id, dataset_id) — convert through the append path.
            for r in data.get("rows", []):
                q, e, t, value, growth, aux, unit, chunk_id, dataset_id = r
                uid = g._intern(g._units, g._unit_id, unit or "")
                cid = g._intern(g._chunks, g._chunk_id_of, chunk_id)
                did = g._intern(g._datasets, g._dataset_id_of, dataset_id)
                g._pending.append((q, e, t, value, growth, aux, uid, cid, did, 0))
            g._consolidate()
        return g
