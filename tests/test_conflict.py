"""Tests for cross-chunk conflict detection + continuity adjudication
(retrieval/conflict.py) and the scaled tamper tier (eval/distractors.py)."""

import numpy as np
import pytest

from ragfin_tpu.data.loader import build_corpus
from ragfin_tpu.data.models import IndexedChunk
from ragfin_tpu.eval.distractors import _scale_uniformly, generate_inscope_distractors
from ragfin_tpu.retrieval.conflict import (
    adjudicate_bucket,
    continuity_score,
    detect_conflicts,
    figures_disagree,
    labeled_figures,
)
from ragfin_tpu.retrieval.consistency import consistency_score

REF = "/root/reference/extract_data"


@pytest.fixture(scope="module")
def real_chunks():
    return build_corpus(REF)


class _Hit:
    def __init__(self, record):
        self.record = record
        self.conflict = None


def _chunk(cid, text, period="Q1_FY2024", ctype="profitability_analysis"):
    return IndexedChunk(
        id=cid, text=text, period=period, chunk_type=ctype,
        statement_type="consolidated", primary_value=1.0, company="ICICI Bank",
    )


class TestLabeledFigures:
    def test_parses_gold_profitability(self, real_chunks):
        prof = next(c for c in real_chunks if c.chunk_type == "profitability_analysis")
        figs = labeled_figures(prof.text)
        assert any("profit" in k for k in figs)
        assert len(figs) >= 4
        assert all(v > 0 for v in figs.values())

    def test_segment_labels_scoped_by_section(self, real_chunks):
        seg = next(c for c in real_chunks if "segment" in c.chunk_type)
        figs = labeled_figures(seg.text)
        # Per-segment revenue labels must not collapse into one "revenue"
        scoped = [k for k in figs if "/" in k]
        assert len(scoped) >= 4

    def test_eps_per_share_parsed(self, real_chunks):
        ratios = next(c for c in real_chunks if "ratio" in c.chunk_type)
        figs = labeled_figures(ratios.text)
        assert any("eps" in k for k in figs)


class TestDisagreement:
    def test_gold_vs_scaled_disagrees(self, real_chunks):
        r = np.random.default_rng(0)
        gold = real_chunks[0]
        forged = _scale_uniformly(gold.text, r)
        disagree, shared = figures_disagree(labeled_figures(gold.text), labeled_figures(forged))
        assert shared >= 3
        assert disagree >= shared - 1  # every ₹ figure moved

    def test_identical_copies_agree(self, real_chunks):
        gold = real_chunks[0]
        disagree, shared = figures_disagree(
            labeled_figures(gold.text), labeled_figures(gold.text)
        )
        assert disagree == 0 and shared >= 3


class TestDetectConflicts:
    def test_scaled_forgery_flags_scope(self, real_chunks):
        r = np.random.default_rng(1)
        gold = real_chunks[0]
        hits = [
            _Hit(gold),
            _Hit(_chunk("forged_1", _scale_uniformly(gold.text, r), gold.period, gold.chunk_type)),
        ]
        scopes = detect_conflicts(hits)
        key = (gold.company, gold.period, gold.chunk_type)
        assert scopes[key]["conflict"] is True

    def test_clean_corpus_no_false_flags(self, real_chunks):
        # All 16 real chunks in one shortlist: distinct scopes, no conflicts.
        hits = [_Hit(c) for c in real_chunks]
        scopes = detect_conflicts(hits)
        assert not any(info["conflict"] for info in scopes.values())

    def test_exact_duplicate_not_a_conflict(self, real_chunks):
        gold = real_chunks[0]
        hits = [_Hit(gold), _Hit(_chunk("copy", gold.text, gold.period, gold.chunk_type))]
        scopes = detect_conflicts(hits)
        key = (gold.company, gold.period, gold.chunk_type)
        assert scopes[key]["conflict"] is False

    def test_cache_reused(self, real_chunks):
        # Figures are only parsed (and cached) for multi-member scopes.
        cache = {}
        gold = real_chunks[0]
        hits = [_Hit(gold), _Hit(_chunk("copy", gold.text, gold.period, gold.chunk_type))]
        detect_conflicts(hits, cache=cache)
        assert set(cache) == {gold.id, "copy"}


class TestContinuity:
    def _by_type(self, chunks, ctype):
        return [c for c in chunks if c.chunk_type == ctype]

    def test_gold_scores_below_scaled_forgery(self, real_chunks):
        # Balance-sheet stocks drift slowly across quarters: the gold Q2
        # chunk's displacement against Q1/Q3/Q4 corroborators must be
        # smaller than a 1.3x-scaled forgery's.
        bs = self._by_type(real_chunks, "balance_sheet_analysis")
        target = bs[1]
        corroborators = [labeled_figures(c.text) for c in bs if c.period != target.period]
        gold_score = continuity_score(labeled_figures(target.text), corroborators)
        # deterministic forgery at factor 1.3 via the currency regex path
        from ragfin_tpu.eval.distractors import _CURRENCY, _format_scaled

        forged_text = _CURRENCY.sub(
            lambda m: m.group(1) + _format_scaled(m.group(2), 1.3), target.text
        )
        forged_score = continuity_score(labeled_figures(forged_text), corroborators)
        assert gold_score is not None and forged_score is not None
        assert gold_score < forged_score

    def test_insufficient_evidence_returns_none(self):
        assert continuity_score({"a": 1.0}, [{"a": 1.1}]) is None

    def test_adjudicate_prefers_gold(self, real_chunks):
        from ragfin_tpu.eval.distractors import _CURRENCY, _format_scaled

        bs = self._by_type(real_chunks, "balance_sheet_analysis")
        target = bs[2]
        corroborators = [labeled_figures(c.text) for c in bs if c.period != target.period]
        members = [_Hit(target)]
        for i, f in enumerate((0.75, 1.35, 1.25)):
            forged = _CURRENCY.sub(
                lambda m: m.group(1) + _format_scaled(m.group(2), f), target.text
            )
            members.append(_Hit(_chunk(f"forged_{i}", forged, target.period, target.chunk_type)))
        ranked = adjudicate_bucket(members, corroborators)
        assert ranked[0][0].record.id == target.id


class TestScaledTier:
    def test_scaled_tier_generates(self, real_chunks):
        out = generate_inscope_distractors(real_chunks, 8, seed=3, tiers=("scaled",))
        assert len(out) == 8
        assert all(c.id.startswith("inscope_scaled") for c in out)
        # All pass in-text consistency with a perfect score (defense-blind
        # by construction).
        for c in out:
            assert consistency_score(c.text) == 1.0

    def test_scaled_preserves_scope_tokens(self, real_chunks):
        out = generate_inscope_distractors(real_chunks, 8, seed=4, tiers=("scaled",))
        for c in out:
            assert c.period in c.text


class TestVectorRAGIntegration:
    def test_abstains_on_contested_scope(self, real_chunks):
        import asyncio

        from ragfin_tpu.index.vector_index import DeviceVectorIndex
        from ragfin_tpu.retrieval.vector_rag import VectorRAG

        r = np.random.default_rng(5)
        gold = [c for c in real_chunks if c.period == "Q1_FY2024"]
        forged = [
            _chunk(f"zz_forged_{i}", _scale_uniformly(g.text, r), g.period, g.chunk_type)
            for i, g in enumerate(gold)
        ]
        idx = DeviceVectorIndex.build(list(real_chunks) + forged)
        rag = VectorRAG(idx)
        result = asyncio.run(
            rag.search_and_answer("What was ICICI Bank's net profit in Q1 FY2024?", top_k=3)
        )
        assert result.get("conflict") is True
        assert result["answer_mode"] == "conflict"
        assert "conflicting figure sets" in result["answer"]

    def test_clean_corpus_answers_normally(self, real_chunks):
        import asyncio

        from ragfin_tpu.index.vector_index import DeviceVectorIndex
        from ragfin_tpu.retrieval.vector_rag import VectorRAG

        idx = DeviceVectorIndex.build(list(real_chunks))
        rag = VectorRAG(idx)
        result = asyncio.run(
            rag.search_and_answer("What was ICICI Bank's net profit in Q1 FY2024?", top_k=3)
        )
        assert "conflict" not in result
        assert result["answer_mode"] == "extractive"

    def test_widened_detection_catches_deep_contradiction(self, real_chunks):
        """Round-4 verdict #4: the abstention trigger must fire when the top
        hit's scope is contested ANYWHERE in the widened detection window,
        not only within the user's top_k slice. The forged copy of the gold
        profitability chunk ranks #2 (below the gold), so at top_k=1 the
        returned slice never contains the contradicting pair — a narrow
        detector cannot see it, the 32-wide one must flag the top hit."""
        import asyncio

        from ragfin_tpu.index.vector_index import DeviceVectorIndex
        from ragfin_tpu.retrieval.vector_rag import VectorRAG

        r = np.random.default_rng(7)
        gold = [c for c in real_chunks if c.period == "Q1_FY2024"]
        prof = next(c for c in gold if c.chunk_type == "profitability_analysis")
        forged = [
            _chunk(
                "zz_deep_forged", _scale_uniformly(prof.text, r),
                prof.period, prof.chunk_type,
            )
        ]
        idx = DeviceVectorIndex.build(list(real_chunks) + forged)
        rag = VectorRAG(idx)
        question = "What was ICICI Bank's net profit in Q1 FY2024?"
        hits1 = rag._search_texts([question], 1)[0]
        # The contradicting PAIR cannot fit a 1-wide slice: whichever member
        # ranks first, a detector confined to the returned hits is blind.
        assert len(hits1) == 1 and hits1[0].record.chunk_type == "profitability_analysis"
        result = asyncio.run(rag.search_and_answer(question, top_k=1))
        assert result.get("conflict") is True
        assert result["answer_mode"] == "conflict"
        # The returned payload still honors top_k.
        assert len(result["contexts"]) == 1
        # Narrow detection (fetch == top_k) misses it — the round-4 gap.
        rag_narrow = VectorRAG(idx, detection_fetch_k=1)
        result_narrow = asyncio.run(rag_narrow.search_and_answer(question, top_k=1))
        assert result_narrow.get("conflict") is None

    def test_detection_can_be_disabled(self, real_chunks):
        import asyncio

        from ragfin_tpu.index.vector_index import DeviceVectorIndex
        from ragfin_tpu.retrieval.vector_rag import VectorRAG

        r = np.random.default_rng(6)
        gold = [c for c in real_chunks if c.period == "Q1_FY2024"]
        forged = [
            _chunk(f"zz_f_{i}", _scale_uniformly(g.text, r), g.period, g.chunk_type)
            for i, g in enumerate(gold)
        ]
        idx = DeviceVectorIndex.build(list(real_chunks) + forged)
        rag = VectorRAG(idx, conflict_detection=False)
        result = asyncio.run(
            rag.search_and_answer("What was ICICI Bank's net profit in Q1 FY2024?", top_k=3)
        )
        assert "conflict" not in result
