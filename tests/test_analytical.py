"""Tests for the deterministic analytical answerer and the honest
tolerance/faithfulness rules it is evaluated under."""

import os

import pytest


@pytest.fixture(scope="module")
def corpus(reference_root):
    from ragfin_tpu.data.loader import build_corpus

    return build_corpus(os.path.join(reference_root, "extract_data"))


@pytest.fixture(scope="module")
def analyst(corpus):
    from ragfin_tpu.retrieval.analytical import AnalyticalAnswerer

    return AnalyticalAnswerer(corpus)


class TestChunkParsing:
    def test_profitability_fields(self, analyst):
        q1 = analyst.data["Q1_FY2024"]
        assert q1.fields["net_profit"] == 10636.0
        assert q1.fields["net_profit_growth"] == 44.0
        assert q1.fields["net_margin"] == 20.4
        assert q1.fields["cost_ratio"] == 69.9
        assert q1.fields["total_income"] == 52084.0

    def test_balance_sheet_fields(self, analyst):
        q1 = analyst.data["Q1_FY2024"]
        assert q1.fields["customer_deposits"] == 1269343.0
        assert q1.fields["total_equity"] == 225150.0
        assert q1.fields["total_assets"] == 2039897.0

    def test_segment_fields(self, analyst):
        q1 = analyst.data["Q1_FY2024"]
        assert q1.segments["retail banking"]["revenue"] == 31057.0
        assert q1.segments["retail banking"]["margin"] == 13.5
        assert q1.segments["treasury"]["revenue"] == 26306.0
        assert q1.segments["others"]["margin"] == 42.1

    def test_eps_fields(self, analyst):
        q1 = analyst.data["Q1_FY2024"]
        assert q1.fields["basic_eps"] == 15.22


class TestIntents:
    def test_direct_fact(self, analyst):
        ans, ids = analyst.answer("What was ICICI's total income in Q3 FY2024?")
        assert "59,480" in ans and "Q3 FY2024" in ans
        assert any("q3" in i for i in ids)

    def test_pair_change_currency(self, analyst):
        ans, _ = analyst.answer(
            "How much did treasury segment revenue increase from Q1 to Q2 FY2024?"
        )
        assert "26,306" in ans and "27,719" in ans and "+5.37%" in ans

    def test_pair_change_percent_is_pp(self, analyst):
        ans, _ = analyst.answer(
            "How much did retail banking margin change from Q1 to Q4 FY2024?"
        )
        assert "1.6 percentage points" in ans and "13.5%" in ans and "15.1%" in ans

    def test_trend_enumerates_quarters(self, analyst):
        ans, ids = analyst.answer(
            "How did ICICI's net profit trend evolve across all four quarters of FY2024?"
        )
        for v in ("10,636", "10,896", "11,053", "11,672", "+44.0% YoY"):
            assert v in ans
        assert len(ids) >= 4  # consumed all four quarters

    def test_extremum_max(self, analyst):
        ans, _ = analyst.answer(
            "Which quarter showed the highest year-over-year growth in net profit?"
        )
        assert ans.startswith("Q1 FY2024") and "44.0%" in ans

    def test_extremum_min(self, analyst):
        ans, _ = analyst.answer("Which quarter had the lowest cost ratio?")
        assert ans.startswith("Q1 FY2024") and "69.9%" in ans

    def test_segment_compare_same_quarter(self, analyst):
        ans, _ = analyst.answer(
            "Compare the margin performance of retail banking vs treasury segment in Q3 FY2024."
        )
        assert "12.6%" in ans and "10.9%" in ans and "1.7" in ans

    def test_ranking(self, analyst):
        ans, _ = analyst.answer(
            "What was the revenue contribution ranking of all segments in Q4 FY2024?"
        )
        assert ans.index("retail banking") < ans.index("treasury") < ans.index("wholesale banking")
        assert "36,410" in ans

    def test_volatility(self, analyst):
        ans, _ = analyst.answer(
            "Which segment showed the most volatile margin performance across FY2024?"
        )
        assert "others" in ans and "27.8%" in ans and "46.4%" in ans and "18.6" in ans

    def test_non_financial_question_returns_none(self, analyst):
        assert analyst.answer("What is the weather in Mumbai?") is None


class TestHonestTolerance:
    def test_percentage_not_matched_by_abs_window(self):
        from ragfin_tpu.eval.answers import number_matches

        # 69.9% must NOT match 100.0 via the ±50 absolute window.
        assert not number_matches(69.9, [100.0])
        # EPS 15.22 must NOT match 60.0.
        assert not number_matches(15.22, [60.0])
        # Crore-scale absolutes keep the ±50 window.
        assert number_matches(10636.0, [10680.0])
        # Relative ±2% still applies to percentages.
        assert number_matches(69.9, [69.0])

    def test_derived_faithfulness(self):
        from ragfin_tpu.eval.answers import faithfulness

        ctx = ["Revenue: ₹26,306 crore", "Revenue: ₹27,719 crore"]
        # +5.37% and ₹1,413 crore are derived from the two context figures.
        assert faithfulness("grew +5.37% (₹1,413 crore)", ctx) == 1.0
        assert faithfulness("grew +99% somehow", ctx) == 0.0


class TestVectorRagIntegration:
    def test_search_and_answer_uses_analytical(self, corpus):
        import asyncio

        from ragfin_tpu.index.vector_index import DeviceVectorIndex
        from ragfin_tpu.retrieval.vector_rag import VectorRAG

        rag = VectorRAG(DeviceVectorIndex.build(corpus))
        out = asyncio.run(
            rag.search_and_answer("What was the change in customer deposits from Q2 to Q3 FY2024?")
        )
        assert out["answer_mode"] == "extractive"
        assert "1,325,253" in out["answer"] and "1,366,842" in out["answer"]
        # Follow-up retrievals surfaced as contexts for grounding.
        ctx_ids = {c["id"] for c in out["contexts"]}
        assert any("q2" in c for c in ctx_ids) and any("q3" in c for c in ctx_ids)


class TestScopeAndMatchingGuards:
    """Round-3 review fixes: the confident offline answerer must bail
    rather than be confidently wrong."""

    def test_substring_metric_does_not_hijack(self, analyst):
        out = analyst.answer("What steps were taken in Q2 FY2024?")
        assert out is None or "eps" not in out[0].lower()

    def test_at_least_is_not_a_minimum_cue(self, analyst):
        out = analyst.answer("Which quarter had at least 15% net margin?")
        assert out is None or "lowest" not in out[0].lower()

    def test_explicit_quarter_survives_expansion_words(self, analyst):
        out = analyst.answer("What was net profit in Q3 FY2024 across all businesses?")
        assert out is not None
        text = out[0]
        # A single-quarter figure, not a four-quarter trend narrative.
        assert "11,053" in text and "Q1" not in text

    def test_other_company_question_bails(self, corpus):
        from ragfin_tpu.data.models import IndexedChunk
        from ragfin_tpu.retrieval.analytical import AnalyticalAnswerer

        other = IndexedChunk(
            id="hdfc_q1_fy2024_profitability_analysis",
            text="HDFC Bank Limited Q1_FY2024 NET PROFIT: ₹12,370 crore",
            period="Q1_FY2024",
            chunk_type="profitability_analysis",
            statement_type="consolidated",
            primary_value=12370.0,
            company="HDFC Bank",
        )
        a = AnalyticalAnswerer(list(corpus) + [other])
        assert a.answer("What was HDFC Bank's net profit in Q1 FY2024?") is None
        own = a.answer("What was the net profit in Q1 FY2024?")
        assert own is not None and "10,636" in own[0]

    def test_non_fy_period_does_not_crash(self, corpus):
        from ragfin_tpu.data.models import IndexedChunk
        from ragfin_tpu.retrieval.analytical import AnalyticalAnswerer

        odd = IndexedChunk(
            id="annual_summary",
            text="ICICI Bank Limited FY2024 annual summary",
            period="FY2024",
            chunk_type="profitability_analysis",
            statement_type="consolidated",
            primary_value=0.0,
        )
        a = AnalyticalAnswerer(list(corpus) + [odd])
        out = a.answer("What was the net profit in Q1 FY2024?")
        assert out is not None and "10,636" in out[0]
