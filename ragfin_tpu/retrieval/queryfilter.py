"""Query-aware metadata filter extraction (Milvus filter-expression parity).

The reference exposes Milvus filter expressions (``collection.query(expr=...)``,
``graph_cons.py:303-324``) but its 16-chunk corpus never needs them for
recall. At the rebuild's 1M–10M-chunk scale, bag-of-words similarity alone
cannot express the conjunctive intent of a question like "ICICI net profit in
Q1 FY2024" (every template token matches thousands of confusables), so the
production query path extracts structured filters — periods, chunk type —
from the question and applies them as a device row mask before scoring
(:meth:`DeviceVectorIndex.search_texts` ``periods=``/``chunk_type=``).

Deterministic keyword parsing over the dataset's period grammar; no LLM.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Sequence

_ORDINALS = {
    "first": 1, "1st": 1,
    "second": 2, "2nd": 2,
    "third": 3, "3rd": 3,
    "fourth": 4, "4th": 4, "last": 4, "final": 4,
}

# Chunk-type hints, checked in order (first match wins); multi-topic
# questions (rankings across segments etc.) get no type filter.
_TYPE_HINTS = [
    ("segment_analysis", ("segment", "retail banking", "wholesale", "treasury",
                          "life insurance", "business line")),
    ("balance_sheet_analysis", ("deposit", "balance sheet", "asset", "equity",
                                "advances", "borrowing", "reserves", "capital position")),
    ("financial_ratios", ("eps", "earnings per share", "per share")),
    ("profitability_analysis", ("profit", "income", "margin", "cost ratio",
                                "expense", "provision", "profitability", "earnings")),
]


@dataclass
class QueryFilters:
    periods: list = field(default_factory=list)  # [] = no period filter
    chunk_type: Optional[str] = None

    @property
    def empty(self) -> bool:
        return not self.periods and self.chunk_type is None


def extract_filters(question: str, known_periods: Sequence[str]) -> QueryFilters:
    """Parse period/type constraints from a question.

    ``known_periods`` is the corpus's period vocabulary; only periods that
    actually exist become filters (a question about an uncovered year yields
    no filter rather than an empty result set).
    """
    ql = question.lower()
    years = sorted({p.split("_FY")[1] for p in known_periods if "_FY" in p})
    m = re.search(r"fy\s?(\d{4})", ql)
    year = m.group(1) if m else None

    qnums = [int(n) for n in re.findall(r"\bq([1-4])\b", ql)]
    for word, num in _ORDINALS.items():
        if re.search(rf"\b{word}\s+quarter", ql):
            qnums.append(num)

    periods: list[str] = []
    if year is not None and year in years:
        if qnums:
            periods = [f"Q{n}_FY{year}" for n in dict.fromkeys(qnums)]
        else:
            # Year named but no quarter (trend questions): all its quarters.
            periods = [p for p in known_periods if p.endswith(f"FY{year}")]
    elif year is None and qnums and len(years) == 1:
        # Quarter named without any year, in a single-year corpus.
        periods = [f"Q{n}_FY{years[0]}" for n in dict.fromkeys(qnums)]
    periods = [p for p in periods if p in set(known_periods)]

    # First match wins; _TYPE_HINTS is ordered most-specific-first (segment
    # words beat the generic profit/income vocabulary). A wrong hint costs
    # only early precision under FilteredSearch's tiered fill, never recall.
    chunk_type = None
    for ctype, words in _TYPE_HINTS:
        if any(w in ql for w in words):
            chunk_type = ctype
            break

    return QueryFilters(periods=periods, chunk_type=chunk_type)


class FilteredSearch:
    """Production retrieval pipeline: query-filter extraction → tiered
    company/period/type-scoped device search → exact sparse re-rank.

    Wraps any index exposing ``search_texts``; drop-in for the eval harness
    and :class:`ragfin_tpu.retrieval.vector_rag.VectorRAG`.

    **Company scoping.** The reference system is single-tenant: its whole
    Milvus collection is one company's filings, so "What was the net profit
    in Q4 FY2024?" is unambiguous there. In a multi-company corpus that
    question is intrinsically ambiguous — no similarity function can resolve
    it — so retrieval scopes to the session's ``default_company`` (the KG
    layer's ``company_name``/``dataset_id`` concept, neo4j_service.py:48)
    unless the question names another known company explicitly.

    **Tiered fill.** Results fill from the most-specific filter outward:
    (company ∧ periods ∧ type) → (company ∧ periods) → (company) → unscoped.
    Each tier is exact-sparse-reranked; later tiers only top up missing
    slots, so a wrong chunk-type hint costs precision-at-1, never recall."""

    def __init__(
        self,
        index,
        rerank: int = 64,
        use_type_hint: bool = True,
        default_company: Optional[str] = "ICICI Bank",
    ):
        self.index = index
        self.rerank = rerank
        self.use_type_hint = use_type_hint
        self.default_company = default_company

    def _vocab(self):
        cached = getattr(self, "_vocab_cache", None)
        if cached is None or cached[0] != len(self.index.records):
            periods = sorted({r.period for r in self.index.records})
            by_company: dict = {}
            for r in self.index.records:
                by_company.setdefault(getattr(r, "company", "ICICI Bank"), set()).add(r.period)
            companies = sorted(by_company)
            cached = (len(self.index.records), periods, companies, by_company)
            self._vocab_cache = cached
        return cached[1], cached[2], cached[3]

    def _company_for(self, question: str, companies: list) -> Optional[str]:
        if len(companies) <= 1:
            return None  # single-tenant corpus: no mask needed
        ql = question.lower()
        for c in companies:
            if c.lower() in ql or c.split()[0].lower() in ql:
                return c
        return self.default_company

    def _latest_fy_periods(self, question_filters: QueryFilters, scoped_periods):
        """Implicit temporal scope: a question that names no fiscal year
        ("Which quarter had the lowest cost ratio?") means the scoped
        company's latest year on record — the reference's latest-metrics
        fallback semantics (graph_service.py:249-256) applied to retrieval."""
        if question_filters.periods:
            return None
        years = sorted({p.split("_FY")[1] for p in scoped_periods if "_FY" in p})
        if not years:
            return None
        return sorted(p for p in scoped_periods if p.endswith(f"FY{years[-1]}"))

    def search_texts(self, queries, top_k: int = 3, method: str = "auto", **kwargs):
        known_periods, companies, by_company = self._vocab()
        out = []
        for q in queries:
            f = extract_filters(q, known_periods)
            company = self._company_for(q, companies)
            scoped_periods = by_company.get(company, set()) if company else known_periods
            latest = self._latest_fy_periods(f, scoped_periods)
            tiers: list[dict] = []
            if f.chunk_type and self.use_type_hint:
                tiers.append(
                    dict(
                        periods=f.periods or latest or None,
                        chunk_type=f.chunk_type,
                        company=company,
                    )
                )
            if f.periods:
                tiers.append(dict(periods=f.periods, company=company))
            elif latest:
                tiers.append(dict(periods=latest, company=company))
            if company is not None:
                tiers.append(dict(company=company))
            tiers.append({})

            hits: list = []
            seen: set = set()
            for flt in tiers:
                if len(hits) >= top_k:
                    break
                got = self.index.search_texts(
                    [q], top_k=top_k, method=method, rerank=self.rerank, **flt
                )[0]
                for h in got:
                    if h.record.id not in seen:
                        seen.add(h.record.id)
                        hits.append(h)
            for rank, h in enumerate(hits[:top_k]):
                h.rank = rank
            out.append(hits[:top_k])
        return out
