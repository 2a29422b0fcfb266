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

# Calendar month -> (fiscal quarter, fiscal-year offset from the calendar
# year). Indian fiscal convention, same mapping the reference chunker uses
# for its period->month keys (chunking_storing (1).py:77-89): FY2024 spans
# Apr 2023 - Mar 2024, so "June 2023" is Q1 FY2024 (offset +1) and
# "March 2024" is Q4 FY2024 (offset 0).
_MONTH_QUARTER = {
    "april": (1, 1), "apr": (1, 1), "may": (1, 1), "june": (1, 1), "jun": (1, 1),
    "july": (2, 1), "jul": (2, 1), "august": (2, 1), "aug": (2, 1),
    "september": (2, 1), "sept": (2, 1), "sep": (2, 1),
    "october": (3, 1), "oct": (3, 1), "november": (3, 1), "nov": (3, 1),
    "december": (3, 1), "dec": (3, 1),
    "january": (4, 0), "jan": (4, 0), "february": (4, 0), "feb": (4, 0),
    "march": (4, 0), "mar": (4, 0),
}
_MONTH_YEAR = re.compile(
    r"\b(" + "|".join(_MONTH_QUARTER) + r")\s+(\d{4})\b"
)

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
    years_vocab = sorted({p.split("_FY")[1] for p in known_periods if "_FY" in p})
    known = set(known_periods)

    def full_year(y: str) -> list[str]:
        """2-digit fiscal years ("FY24") resolve against the corpus's year
        vocabulary; 4-digit years pass through."""
        if len(y) == 4:
            return [y]
        return [v for v in years_vocab if v.endswith(y)]

    # Explicit quarter+year pairs first ("Q4 FY2024", "FY2024 Q4",
    # "Q2 of/in FY2024", and the Indian-market compact forms "Q1FY24" /
    # "3QFY24") so multi-year comparisons keep each quarter with ITS year;
    # the matched spans are cut out before leftover parsing.
    pairs: list[tuple[int, str]] = []
    spans: list[tuple[int, int]] = []
    def relative_shift(pos: int) -> int:
        """±1 fiscal-quarter shift for temporal-offset phrases preceding a
        period mention: "the quarter (right) after June 2023" means Q2, not
        the June quarter itself; "the quarter before Q3 FY2024" means Q2."""
        prefix = ql[:pos]
        if re.search(r"\b(?:quarter|quater|qtr|period)\s+(?:right\s+|immediately\s+|just\s+)?(?:after|following)\s*$", prefix):
            return 1
        if re.search(r"\b(?:quarter|quater|qtr|period)\s+(?:right\s+|immediately\s+|just\s+)?(?:before|preceding|prior\s+to)\s*$", prefix):
            return -1
        return 0

    def shifted(qn: int, y: str, shift: int) -> tuple[int, str]:
        if not shift:
            return qn, y
        qn += shift
        if qn > 4:
            return 1, str(int(y) + 1)
        if qn < 1:
            return 4, str(int(y) - 1)
        return qn, y

    for pat, qg, yg in (
        (r"\bq([1-4])\s*(?:of|in|for)?[\s_-]*(?:fy|fiscal)\s?(\d{4}|\d{2})\b", 1, 2),
        (r"\b([1-4])q[\s_-]*(?:fy|fiscal)\s?(\d{4}|\d{2})\b", 1, 2),
        (r"\b(?:fy|fiscal)\s?(\d{4})\s*(?:,)?[\s_-]*q([1-4])\b", 2, 1),
    ):
        for m in re.finditer(pat, ql):
            shift = relative_shift(m.start())
            for y in full_year(m.group(yg)):
                pairs.append(shifted(int(m.group(qg)), y, shift))
            spans.append(m.span())
    # Calendar month+year mentions ("the June 2023 quarter", "quarter ending
    # September 2023") map through the fiscal calendar. "may" doubles as an
    # English modal ("how much may 2024 bring?") — accept it as a month only
    # when the original question capitalizes it.
    for m in _MONTH_YEAR.finditer(ql):
        if m.group(1) == "may" and question[m.start():m.start() + 1] != "M":
            continue
        qn, offset = _MONTH_QUARTER[m.group(1)]
        pairs.append(shifted(qn, str(int(m.group(2)) + offset), relative_shift(m.start())))
        spans.append(m.span())
    residual = list(ql)
    for a, b in spans:
        residual[a:b] = " " * (b - a)
    residual = "".join(residual)

    rest_years = [
        y
        for raw in dict.fromkeys(re.findall(r"(?:fy|fiscal)\s?(\d{4}|\d{2})\b", residual))
        for y in full_year(raw)
    ]
    rest_years = list(dict.fromkeys(rest_years))
    rest_qnums = [int(n) for n in re.findall(r"\bq([1-4])\b", residual)]
    # "second quarter" / "4th qtr" / the common "quater" typo, plus the
    # "first|final three months" idiom.
    for word, num in _ORDINALS.items():
        if re.search(rf"\b{word}\s+(?:quarter|quater|qtr)", residual):
            rest_qnums.append(num)
        if re.search(rf"\b{word}\s+three\s+months", residual):
            rest_qnums.append(num)
    # Half-year convention: H1/first half = Q1+Q2, H2/second half = Q3+Q4.
    # A comparative ellipsis ("the second half ... than the first") names
    # BOTH halves — the elided half must stay in scope (recall-safety).
    halves = set()
    if re.search(r"\b(?:h1|1h|first\s+half)\b", residual):
        halves.add(1)
    if re.search(r"\b(?:h2|2h|second\s+half|latter\s+half)\b", residual):
        halves.add(2)
    if halves and re.search(r"\b(?:than|vs|versus|against|over)\s+the\s+(?:first|second|other)\b", residual):
        halves = {1, 2}
    if 1 in halves:
        rest_qnums += [1, 2]
    if 2 in halves:
        rest_qnums += [3, 4]
    rest_qnums = list(dict.fromkeys(rest_qnums))

    periods: list[str] = [f"Q{n}_FY{y}" for n, y in dict.fromkeys(pairs)]
    if rest_qnums:
        if rest_years:
            # Loose quarters pair with every mentioned year (recall-safe).
            periods += [f"Q{n}_FY{y}" for y in rest_years for n in rest_qnums]
        elif pairs:
            periods += [
                f"Q{n}_FY{y}" for y in dict.fromkeys(y for _, y in pairs)
                for n in rest_qnums
            ]
        elif len(years_vocab) == 1:
            # Quarter named without any year, in a single-year corpus.
            periods += [f"Q{n}_FY{years_vocab[0]}" for n in rest_qnums]
    else:
        # Year(s) named without a quarter (trend questions): all quarters.
        for y in rest_years:
            periods += [p for p in known_periods if p.endswith(f"FY{y}")]
    periods = [p for p in dict.fromkeys(periods) if p in known]

    # First match wins; _TYPE_HINTS is ordered most-specific-first (segment
    # words beat the generic profit/income vocabulary). The hint is a
    # ranking prior, not a hard filter: FilteredSearch always fetches the
    # untyped sibling tier too (see its docstring for the semantics).
    chunk_type = None
    for ctype, words in _TYPE_HINTS:
        if any(w in ql for w in words):
            chunk_type = ctype
            break

    return QueryFilters(periods=periods, chunk_type=chunk_type)


# Words too generic to identify a company on their own ("Bank of Baroda"
# must not claim every question containing "bank").
_GENERIC_NAME_TOKENS = frozenset(
    {"bank", "banking", "the", "of", "and", "india", "indian", "state",
     "national", "life", "general", "limited", "ltd", "finance",
     "financial", "services", "capital", "group", "corp", "corporation"}
)


def company_for_question(
    question: str, companies: Sequence[str], default: Optional[str] = None
) -> Optional[str]:
    """Resolve which company a question is about (shared by the vector
    pipeline's scoping and the graph strategy dispatch — reference parity:
    both its Milvus collection and its KG Organization node are single-
    tenant, so every question is implicitly scoped; a multi-company store
    must scope explicitly or conflate banks).

    Full-name match first (most tokens wins), then a distinctive token
    exactly one company owns; otherwise ``default``. A single-company list
    returns None (no mask needed)."""
    companies = list(companies)
    if len(companies) <= 1:
        return None
    qtokens = set(re.findall(r"[a-z0-9&]+", question.lower()))
    for c in sorted(companies, key=lambda c: -len(c.split())):
        toks = [t.lower() for t in c.split()]
        if all(t in qtokens for t in toks):
            return c
    owners: dict[str, set] = {}
    for c in companies:
        for t in set(c.lower().split()) - _GENERIC_NAME_TOKENS:
            owners.setdefault(t, set()).add(c)
    for t, cs in owners.items():
        if t in qtokens and len(cs) == 1:
            return next(iter(cs))
    return default


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

    **Tiered fill.** Results fill from the most-specific filter outward in
    GROUPS: [(company ∧ periods ∧ type), (company ∧ periods)] → (company) →
    unscoped. Both tiers of the first group are always fetched; typed hits
    rank first (the hint is a deliberate ranking prior — under the lexical
    embedder it corrects raw-score inversions and measures ~2.5 recall@3
    points better than score-ordered merging on qa_subset), so a wrong hint
    can demote an other-type gold below the typed block at small k, but it
    is always in the candidate list (recall@k recovers for k > the typed
    block). Later groups only top up missing slots."""

    def __init__(
        self,
        index,
        rerank: int = 64,
        use_type_hint: bool = True,
        default_company: Optional[str] = "ICICI Bank",
        consistency_weight: float = 0.0,
    ):
        self.index = index
        self.rerank = rerank
        self.use_type_hint = use_type_hint
        self.default_company = default_company
        # Figure-consistency re-rank weight (retrieval/consistency.py):
        # similarity is scaled by how well a chunk's self-declared arithmetic
        # ties out. Defense against in-scope figure-tampered near-duplicates
        # that survive every metadata mask.
        self.consistency_weight = consistency_weight

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
        # Full-name match first ("HDFC Life" beats "HDFC Bank"), then a
        # distinctive token exactly one company owns ("icici", "kotak").
        return company_for_question(question, companies, self.default_company)

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

    def _tier_groups(self, q: str, known_periods, companies, by_company):
        """The query's tier-group plan (see search_texts)."""
        # Extract filters from the EXPANDED question: an idiomatic
        # paraphrase ("how did the bottom line move") carries no type-hint
        # vocabulary until models/synonyms.py appends the canonical terms
        # ("net profit"), and without the hint the typed tier — the ranking
        # prior that wins against same-scope forgeries — never fires.
        from ..models.synonyms import expand_query

        f = extract_filters(expand_query(q), known_periods)
        company = self._company_for(q, companies)
        scoped_periods = by_company.get(company, set()) if company else known_periods
        latest = self._latest_fy_periods(f, scoped_periods)
        groups: list[list[dict]] = []
        scoped: list[dict] = []
        if f.chunk_type and self.use_type_hint:
            scoped.append(
                dict(
                    periods=f.periods or latest or None,
                    chunk_type=f.chunk_type,
                    company=company,
                )
            )
        if f.periods:
            scoped.append(dict(periods=f.periods, company=company))
        elif latest:
            scoped.append(dict(periods=latest, company=company))
        if scoped:
            groups.append(scoped)
        if company is not None:
            groups.append([dict(company=company)])
        groups.append([{}])
        return groups

    def search_texts(self, queries, top_k: int = 3, method: str = "auto", **kwargs):
        """Tiered scoped search.

        Queries with IDENTICAL tier plans share device dispatches (one
        multi-query index call per tier) — without this, the serving
        batcher's grouped calls would degenerate back into per-query
        dispatches. Per-query results are identical to the sequential
        formulation: a member stops consuming tier groups once it has
        ``top_k`` hits.
        """
        known_periods, companies, by_company = self._vocab()
        queries = list(queries)

        def plan_key(groups) -> str:
            return repr(groups)

        by_plan: dict[str, list[int]] = {}
        plans: dict[str, list] = {}
        for i, q in enumerate(queries):
            groups = self._tier_groups(q, known_periods, companies, by_company)
            key = plan_key(groups)
            by_plan.setdefault(key, []).append(i)
            plans[key] = groups

        out: list = [None] * len(queries)
        for key, idxs in by_plan.items():
            groups = plans[key]
            hits = {i: [] for i in idxs}
            seen = {i: set() for i in idxs}
            for group in groups:
                active = [i for i in idxs if len(hits[i]) < top_k]
                if not active:
                    break
                qs = [queries[i] for i in active]
                extra = {}
                if self.consistency_weight > 0 and getattr(
                    self.index, "supports_filters", False
                ):
                    extra["consistency_weight"] = self.consistency_weight
                if (
                    hasattr(self.index, "search_texts_tiers")
                    and not kwargs
                    and len(group) > 1
                ):
                    # One device dispatch for the whole tier group (the
                    # [Q, N] scores are shared across the group's masks) —
                    # serving through the tunnel is dispatch-bound.
                    lists_per_tier = self.index.search_texts_tiers(
                        qs, group, top_k=top_k, method=method,
                        rerank=self.rerank, **extra,
                    )
                else:
                    lists_per_tier = [
                        # Caller-supplied filters (**kwargs) compose with —
                        # and override — the tier-derived ones.
                        self.index.search_texts(
                            qs, top_k=top_k, method=method,
                            rerank=self.rerank, **{**extra, **flt, **kwargs},
                        )
                        for flt in group
                    ]
                # Tier order IS the ranking prior: typed hits precede the
                # untyped sibling's. Under the lexical embedder the hint is
                # more reliable than raw scores (score-ordered and
                # top-hit-promotion merges both measured ~2.5 recall@3
                # points WORSE on qa_subset — raw-score inversions like a
                # key_ratios chunk outscoring the gold profitability chunk
                # are exactly what the hint corrects). The sibling is still
                # always fetched, so other-type golds can be demoted below
                # the typed block (≤ top_k positions) but never dropped
                # from the candidate list.
                for row, i in enumerate(active):
                    for tier_lists in lists_per_tier:
                        for h in tier_lists[row]:
                            if h.record.id not in seen[i]:
                                seen[i].add(h.record.id)
                                hits[i].append(h)
            for i in idxs:
                top = hits[i][:top_k]
                for rank, h in enumerate(top):
                    h.rank = rank
                out[i] = top
        return out
