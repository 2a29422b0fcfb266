"""Chunker parity tests against the frozen reference snapshot.

The 16-chunk snapshot at ``FinRag_knowledge_graph/chunks.json`` is the golden
oracle (SURVEY.md §4): our chunker must reproduce every id, period, type, and
byte of text.
"""

import pytest

from ragfin_tpu.data.chunker import (
    classify_quarterly_files,
    create_complete_context_chunks,
    period_keys,
)


class TestPeriodKeys:
    @pytest.mark.parametrize(
        "period,cur,prev",
        [
            ("Q1_FY2024", "june2023", "june2022"),
            ("Q2_FY2024", "september2023", "september2022"),
            ("Q3_FY2024", "december2023", "december2022"),
            ("Q4_FY2024", "march2024", "march2023"),
            ("Q1_FY2023", "june2022", "june2021"),
            ("Q4_FY2023", "march2023", "march2022"),
            # Generalizes beyond the reference's hardcoded FY2023/24 table.
            ("Q2_FY2030", "september2029", "september2028"),
        ],
    )
    def test_mapping(self, period, cur, prev):
        assert period_keys(period) == (cur, prev)

    def test_invalid_period(self):
        assert period_keys("garbage") == (None, None)


class TestGoldenParity:
    def test_sixteen_chunks(self, corpus_chunks):
        assert len(corpus_chunks) == 16

    def test_four_per_quarter(self, corpus_chunks):
        from collections import Counter

        per_period = Counter(c.period for c in corpus_chunks)
        assert per_period == {
            "Q1_FY2024": 4,
            "Q2_FY2024": 4,
            "Q3_FY2024": 4,
            "Q4_FY2024": 4,
        }

    def test_exact_text_parity(self, corpus_chunks, golden_chunks):
        golden = {g["id"]: g for g in golden_chunks}
        assert set(golden) == {c.id for c in corpus_chunks}
        for c in corpus_chunks:
            g = golden[c.id]
            assert c.text == g["text"], f"text mismatch for {c.id}"
            assert c.period == g["period"]
            assert c.chunk_type == g["type"]
            assert len(c.text) == g["size"]

    def test_primary_values(self, corpus_chunks):
        by_id = {c.id: c for c in corpus_chunks}
        # Net profit for Q1 (reference chunk text: ₹10,636 crore).
        assert by_id["icici_q1_fy2024_profitability_analysis"].primary_value == pytest.approx(10636.12)
        assert by_id["icici_q1_fy2024_balance_sheet_health"].primary_value == pytest.approx(2039897.4)
        assert by_id["icici_q1_fy2024_key_ratios"].primary_value == pytest.approx(15.22)


class TestClassification:
    def test_roles_detected(self, reference_root):
        from ragfin_tpu.data.loader import load_quarter_files
        import os

        files = load_quarter_files(os.path.join(reference_root, "extract_data", "icici_q1_2023"))
        roles = classify_quarterly_files(files)
        assert roles["fin"] is not None
        assert roles["segmental"] is not None
        assert roles["balance"] is not None

    def test_missing_fin_yields_empty(self):
        assert create_complete_context_chunks([{"reportType": "OTHER"}], "Q1_FY2024") == []

    def test_order_independence(self, reference_root):
        import os

        from ragfin_tpu.data.loader import load_quarter_files

        files = load_quarter_files(os.path.join(reference_root, "extract_data", "icici_q1_2023"))
        forward = create_complete_context_chunks(files, "Q1_FY2024")
        backward = create_complete_context_chunks(list(reversed(files)), "Q1_FY2024")
        assert [c.id for c in forward] == [c.id for c in backward]
        assert [c.text for c in forward] == [c.text for c in backward]
