"""DeviceVectorIndex build/search/persistence + recall parity gates."""

import numpy as np
import pytest

from ragfin_tpu.eval.datasets import load_qa_subset, load_vector_eval
from ragfin_tpu.eval.harness import evaluate_retrieval, score_retrieval
from ragfin_tpu.index.vector_index import DeviceVectorIndex


@pytest.fixture(scope="module")
def index(request):
    chunks = request.getfixturevalue("corpus_chunks")
    return DeviceVectorIndex.build(chunks)


# make module-scoped fixture able to use session fixture
@pytest.fixture(scope="module")
def corpus_chunks(reference_root):
    from ragfin_tpu.data.loader import build_corpus
    import os

    return build_corpus(os.path.join(reference_root, "extract_data"))


class TestIndex:
    def test_build_shapes(self, index):
        assert len(index) == 16
        assert index.matrix_t.shape[0] == 384
        assert index.matrix_t.shape[1] % 2048 == 0  # padded

    def test_rows_unit_norm(self, index):
        m = np.asarray(index.matrix_t[:, : index.n].T)
        np.testing.assert_allclose(np.linalg.norm(m, axis=1), 1.0, rtol=1e-5)

    def test_search_returns_expected_chunk(self, index):
        hits = index.search_texts(["What was ICICI Bank's net profit in Q1 FY2024?"], top_k=3)[0]
        assert hits[0].id == "icici_q1_fy2024_profitability_analysis"

    def test_get_by_ids(self, index):
        recs = index.get_by_ids(["icici_q2_fy2024_key_ratios", "nonexistent"])
        assert len(recs) == 1 and recs[0].period == "Q2_FY2024"

    def test_stats(self, index):
        s = index.stats()
        assert s["num_entities"] == 16
        assert s["metric_type"] == "COSINE"
        assert len(s["periods"]) == 4

    def test_save_load_roundtrip(self, index, tmp_path):
        d = str(tmp_path / "idx")
        index.save(d)
        loaded = DeviceVectorIndex.load(d)
        assert len(loaded) == len(index)
        q = "How did retail banking perform in Q3 FY2024?"
        a = [h.id for h in index.search_texts([q], top_k=5)[0]]
        b = [h.id for h in loaded.search_texts([q], top_k=5)[0]]
        assert a == b


class TestRecallParity:
    """Parity gates from BASELINE.md: recall@10 on the labeled QA datasets."""

    def test_qa_subset_recall_at_10(self, index, reference_root):
        from ragfin_tpu.retrieval.queryfilter import FilteredSearch

        qa = load_qa_subset(f"{reference_root}/qa_subset.json")
        # Production pipeline (what VectorRAG serves): perfect recall.
        s = evaluate_retrieval(FilteredSearch(index), qa, k=10).summary()
        assert s["retrieval_recall"]["mean"] == 1.0
        assert s["zero_recall_queries"] == 0
        # Raw embedding-only ablation stays near-perfect on the 16-chunk
        # corpus (data-value numbers are no longer retrieval features).
        s = evaluate_retrieval(index, qa, k=10).summary()
        assert s["retrieval_recall"]["mean"] >= 0.98

    def test_vector_eval_recall_at_10(self, index, reference_root):
        ve = load_vector_eval(f"{reference_root}/vector_rag_evaluation_dataset.json")
        s = evaluate_retrieval(index, ve, k=10).summary()
        assert s["retrieval_recall"]["mean"] == 1.0

    def test_qa_subset_recall_at_3_beats_reference(self, index, reference_root):
        """Reference measured recall 0.617 (res_ablation summary :10-11)."""
        qa = load_qa_subset(f"{reference_root}/qa_subset.json")
        s = evaluate_retrieval(index, qa, k=3).summary()
        assert s["retrieval_recall"]["mean"] > 0.617


class TestScoring:
    def test_score_retrieval_perfect(self):
        p, r, f1 = score_retrieval(["a"], ["a", "b"])
        assert r == 1.0 and p == 0.5

    def test_score_retrieval_empty(self):
        assert score_retrieval([], ["a"]) == (0.0, 0.0, 0.0)


class TestFilteredSearch:
    """Metadata-filtered search (Milvus filter-expression parity)."""

    def test_period_filter(self, index):
        hits = index.search_texts(["net profit"], top_k=4, period="Q3_FY2024")[0]
        assert hits and all(h.record.period == "Q3_FY2024" for h in hits)

    def test_chunk_type_filter(self, index):
        hits = index.search_texts(["performance"], top_k=4, chunk_type="segment_analysis")[0]
        assert hits and all(h.record.chunk_type == "segment_analysis" for h in hits)

    def test_combined_filter_single_result(self, index):
        hits = index.search_texts(
            ["anything"], top_k=10, period="Q2_FY2024", chunk_type="financial_ratios"
        )[0]
        assert [h.id for h in hits] == ["icici_q2_fy2024_key_ratios"]

    def test_predicate_filter(self, index):
        hits = index.search_texts(
            ["profit"], top_k=10, predicate=lambda r: r.primary_value > 100000
        )[0]
        assert hits and all(h.record.primary_value > 100000 for h in hits)

    def test_empty_filter_result(self, index):
        hits = index.search_texts(["x"], top_k=3, period="Q9_FY2099")[0]
        assert hits == []


class TestIncrementalInsert:
    def test_extended_with(self, index, corpus_chunks):
        from ragfin_tpu.data.models import IndexedChunk

        extra = IndexedChunk(
            id="synthetic_q1_fy2025_note",
            text="ICICI Bank Q1 FY2025 special synthetic disclosure about digital lending revenue",
            period="Q1_FY2025",
            chunk_type="profitability_analysis",
        )
        bigger = index.extended_with([extra])
        assert len(bigger) == len(index) + 1
        hits = bigger.search_texts(["synthetic disclosure digital lending"], top_k=1)[0]
        assert hits[0].id == "synthetic_q1_fy2025_note"
        # original results unchanged
        q = "What was ICICI Bank's net profit in Q1 FY2024?"
        assert [h.id for h in bigger.search_texts([q], top_k=1)[0]] == [
            h.id for h in index.search_texts([q], top_k=1)[0]
        ]


class TestTierGroupDispatch:
    """search_texts_tiers must reproduce the per-tier search_texts results
    exactly (one-dispatch tier groups, ops/topk.py cosine_topk_dense_multi)."""

    TIERS = [
        dict(periods=["Q1_FY2024"], chunk_type="profitability_analysis",
             company="ICICI Bank"),
        dict(periods=["Q1_FY2024"], company="ICICI Bank"),
    ]
    QS = ["net profit Q1 FY2024", "deposits and advances Q1"]

    def _assert_parity(self, index, **kw):
        grouped = index.search_texts_tiers(self.QS, self.TIERS, top_k=5, **kw)
        for flt, tier_hits in zip(self.TIERS, grouped):
            single = index.search_texts(self.QS, top_k=5, **flt, **kw)
            for a, b in zip(tier_hits, single):
                assert [h.record.id for h in a] == [h.record.id for h in b]
                np.testing.assert_allclose(
                    [h.score for h in a], [h.score for h in b], rtol=1e-5
                )

    def test_parity_f32(self, index):
        self._assert_parity(index)

    def test_parity_rerank(self, index):
        self._assert_parity(index, rerank=8)

    def test_parity_consistency(self, index):
        self._assert_parity(index, rerank=8, consistency_weight=0.95)

    def test_parity_int8(self, corpus_chunks):
        idx8 = DeviceVectorIndex.build(corpus_chunks, dtype="int8")
        self._assert_parity(idx8)

    def test_unscoped_tier(self, index):
        grouped = index.search_texts_tiers(self.QS, [{}], top_k=3)
        single = index.search_texts(self.QS, top_k=3)
        # The unscoped tier runs through the dense-multi path while plain
        # search_texts uses the fused path — same ids either way.
        for a, b in zip(grouped[0], single):
            assert [h.record.id for h in a] == [h.record.id for h in b]

    def test_filtered_search_results_unchanged(self, index):
        """FilteredSearch must return identical results whether the group
        runs as one dispatch or per-tier calls."""
        from ragfin_tpu.retrieval.queryfilter import FilteredSearch

        qs = [
            "What was ICICI Bank's net profit in Q1 FY2024?",
            "Compare segment revenue Q1 vs Q4 FY2024",
        ]
        fs = FilteredSearch(index)
        grouped = fs.search_texts(qs, top_k=3)

        class NoTiers:
            def __init__(self, inner):
                self._inner = inner
                self.records = inner.records
                self.supports_filters = inner.supports_filters

            def search_texts(self, *a, **kw):
                return self._inner.search_texts(*a, **kw)

        fallback = FilteredSearch(NoTiers(index)).search_texts(qs, top_k=3)
        for a, b in zip(grouped, fallback):
            assert [h.record.id for h in a] == [h.record.id for h in b]


class TestStaleEncoderTable:
    def test_untuned_resave_drops_stale_table(self, corpus_chunks, tmp_path):
        """Tuned save -> untuned re-save to the SAME directory -> load must
        reconstruct the untuned (seed) encoder, not attach the stale table
        (round-3 review finding: a mismatched projection silently breaks
        query/corpus agreement)."""
        import jax.numpy as jnp

        from ragfin_tpu.models.bag_encoder import BagEncoder

        d = str(tmp_path / "idx")
        base = BagEncoder()
        tuned = BagEncoder(table=jnp.asarray(np.asarray(base.table) * 1.5))
        DeviceVectorIndex.build(corpus_chunks, encoder=tuned).save(d)
        import os

        assert os.path.exists(os.path.join(d, "encoder_table.npy"))

        DeviceVectorIndex.build(corpus_chunks).save(d)  # untuned re-save
        assert not os.path.exists(os.path.join(d, "encoder_table.npy"))
        back = DeviceVectorIndex.load(d)
        assert not back.encoder.tuned
        np.testing.assert_array_equal(
            np.asarray(back.encoder.table), np.asarray(BagEncoder().table)
        )


class TestDeviceMaskCache:
    """Filter masks upload to device once per filter key (the 1M-serving
    latency fix): repeated searches with the same filters must reuse both
    the host mask and the device buffer."""

    def test_host_and_device_mask_reuse(self, corpus_chunks):
        idx = DeviceVectorIndex.build(corpus_chunks)
        kwargs = dict(periods=["Q1_FY2024"], chunk_type="financial_ratios")
        first = idx.search_texts(["basic EPS"], top_k=3, **kwargs)
        host1 = dict(getattr(idx, "_host_mask_cache", {}))
        dev1 = dict(getattr(idx, "_device_mask_cache", {}))
        assert host1, "host mask cache should be populated"
        again = idx.search_texts(["basic EPS"], top_k=3, **kwargs)
        host2 = getattr(idx, "_host_mask_cache", {})
        dev2 = getattr(idx, "_device_mask_cache", {})
        # Same cached objects (no recompute / re-upload), same results.
        for k, v in host1.items():
            assert host2[k] is v
        for k, v in dev1.items():
            assert dev2[k] is v
        assert [h.record.id for h in first[0]] == [h.record.id for h in again[0]]

    def test_tier_group_masks_cached_across_calls(self, corpus_chunks):
        from ragfin_tpu.retrieval.queryfilter import FilteredSearch

        idx = DeviceVectorIndex.build(corpus_chunks)
        fs = FilteredSearch(idx)
        q = "What was the net profit in Q1 FY2024?"
        r1 = [h.record.id for h in fs.search_texts([q], top_k=3)[0]]
        cache1 = dict(getattr(idx, "_device_mask_cache", {}))
        r2 = [h.record.id for h in fs.search_texts([q], top_k=3)[0]]
        cache2 = getattr(idx, "_device_mask_cache", {})
        assert r1 == r2
        for k, v in cache1.items():
            assert cache2[k] is v


class TestQueryBucketPadding:
    """Device Q is bucket-padded to {1, 8, 64, k*64} (vector_index._q_bucket)
    so the serving batcher's arbitrary batch sizes map to a handful of
    warmable XLA executables instead of a compile storm (round-4 concurrent
    benchmark collapsed to ~1 QPS on per-Q recompiles through the tunnel)."""

    def test_bucket_values(self):
        from ragfin_tpu.index.vector_index import _q_bucket

        assert [_q_bucket(n) for n in (0, 1, 2, 5, 8, 9, 63, 64)] == [
            1, 1, 8, 8, 8, 64, 64, 64,
        ]
        assert _q_bucket(65) == 128
        assert _q_bucket(129) == 192

    def test_pad_shape_and_content(self):
        from ragfin_tpu.index.vector_index import _pad_queries

        q = np.random.default_rng(0).normal(size=(5, 384)).astype(np.float32)
        p = _pad_queries(q)
        assert p.shape == (8, 384)
        np.testing.assert_array_equal(p[:5], q)
        assert not p[5:].any()
        q1 = np.ones((8, 384), np.float32)
        assert _pad_queries(q1) is q1  # exact bucket: no copy

    def test_padded_batch_matches_per_query(self, index):
        """A 3-query filtered search (padded to Q=8 on device) returns
        exactly what three 1-query searches return."""
        qs = [
            "What was the net profit?",
            "How did retail banking perform?",
            "What was the basic EPS?",
        ]
        kwargs = dict(periods=["Q1_FY2024", "Q2_FY2024"], top_k=4)
        batched = index.search_texts(qs, **kwargs)
        for qi, q in enumerate(qs):
            solo = index.search_texts([q], **kwargs)[0]
            assert [(h.id, round(h.score, 5)) for h in batched[qi]] == [
                (h.id, round(h.score, 5)) for h in solo
            ]

    def test_padded_tier_group_matches_per_query(self, index):
        from ragfin_tpu.retrieval.queryfilter import FilteredSearch

        fs = FilteredSearch(index)
        qs = [
            "What was the net profit in Q1 FY2024?",
            "What was the cost to income ratio in Q1 FY2024?",
        ]
        batched = fs.search_texts(qs, top_k=3)
        for qi, q in enumerate(qs):
            solo = fs.search_texts([q], top_k=3)[0]
            assert [h.record.id for h in batched[qi]] == [
                h.record.id for h in solo
            ]


class TestPeriodGrammar:
    """Round-5 period-grammar extensions in queryfilter.extract_filters:
    Indian-market compact forms, 2-digit fiscal years, calendar-month
    mapping (the reference chunker's fiscal calendar,
    chunking_storing (1).py:77-89), half-year conventions, common typos."""

    KNOWN = [f"Q{q}_FY2024" for q in range(1, 5)] + [f"Q{q}_FY2023" for q in range(1, 5)]

    def _periods(self, q):
        from ragfin_tpu.retrieval.queryfilter import extract_filters

        return extract_filters(q, self.KNOWN).periods

    def test_compact_quarter_year(self):
        assert self._periods("ICICI Q1FY24 PAT?") == ["Q1_FY2024"]
        assert self._periods("4QFY24 NII figure") == ["Q4_FY2024"]
        assert self._periods("3QFY2024 deposits") == ["Q3_FY2024"]

    def test_two_digit_year_resolves_against_vocab(self):
        assert self._periods("net profit in Q2 FY23") == ["Q2_FY2023"]
        # An unknown 2-digit year maps to nothing (not a wrong year).
        assert self._periods("net profit in Q2 FY99") == []

    def test_month_year_maps_through_fiscal_calendar(self):
        assert self._periods("the June 2023 quarter results") == ["Q1_FY2024"]
        assert self._periods("quarter ending September 2023") == ["Q2_FY2024"]
        assert self._periods("as of December 2023") == ["Q3_FY2024"]
        assert self._periods("the quarter that ended in March 2024") == ["Q4_FY2024"]
        # Jan-Mar belong to the SAME fiscal year; Apr-Dec to the next.
        assert self._periods("January 2024 numbers") == ["Q4_FY2024"]
        assert self._periods("April 2023 onwards") == ["Q1_FY2024"]

    def test_half_year_convention(self):
        assert self._periods("first half of FY2024 profit") == ["Q1_FY2024", "Q2_FY2024"]
        assert self._periods("H2 FY2024 deposits") == ["Q3_FY2024", "Q4_FY2024"]

    def test_comparative_ellipsis_keeps_both_halves(self):
        got = self._periods("Was the second half of FY2024 better than the first?")
        assert got == ["Q1_FY2024", "Q2_FY2024", "Q3_FY2024", "Q4_FY2024"] or sorted(got) == [
            "Q1_FY2024", "Q2_FY2024", "Q3_FY2024", "Q4_FY2024"
        ]

    def test_quarter_typo_and_abbreviation(self):
        assert self._periods("total income in the fourth quater of FY2024") == ["Q4_FY2024"]
        assert self._periods("2nd qtr FY2024 advances") == ["Q2_FY2024"]

    def test_three_months_idiom(self):
        assert self._periods("the final three months of fiscal 2024") == ["Q4_FY2024"]

    def test_may_modal_vs_month(self):
        # Lowercase "may" is the English modal; only a capitalized May
        # counts as the month.
        assert self._periods("how much may 2024 bring for the bank") == []
        assert self._periods("deposits as of May 2023") == ["Q1_FY2024"]

    def test_relative_quarter_offset(self):
        assert self._periods("the quarter right after June 2023") == ["Q2_FY2024"]
        assert self._periods("the quarter before Q3 FY2024") == ["Q2_FY2024"]
        # Wrap across fiscal years in both directions.
        assert self._periods("the quarter after March 2023") == ["Q1_FY2024"]
        assert self._periods("the quarter prior to Q1 FY2024") == ["Q4_FY2023"]
        # No offset phrase: the mention itself.
        assert self._periods("results for June 2023") == ["Q1_FY2024"]

    def test_existing_grammar_unchanged(self):
        assert self._periods("What was the net profit in Q1 FY2024?") == ["Q1_FY2024"]
        assert self._periods("Compare Q1 FY2023 with Q1 FY2024") == ["Q1_FY2023", "Q1_FY2024"]
        assert self._periods("How did deposits trend across FY2024?") == [
            "Q1_FY2024", "Q2_FY2024", "Q3_FY2024", "Q4_FY2024"
        ]


class TestHoldoutPhrasings:
    def test_loader_and_labels(self):
        from ragfin_tpu.eval.datasets import load_holdout_phrasings

        hp = load_holdout_phrasings()
        assert len(hp) == 48
        styles = {q.category for q in hp}
        assert styles == {"colloquial", "abbreviation", "misspelled", "compositional"}
        valid_suffixes = (
            "profitability_analysis", "balance_sheet_health",
            "key_ratios", "segment_performance",
        )
        for q in hp:
            assert q.expected_chunks, q.id
            for c in q.expected_chunks:
                assert c.startswith("icici_q") and c.endswith(valid_suffixes), c


class TestHostQuantizePath:
    """Round-5: large int8 builds quantize on HOST (the device path stages
    the full f32 [D, N] — 15.4 GB at 10M, over HBM — before quantizing).
    The host path must reproduce the device path's int8 matrix, scales,
    search results, and repair basis."""

    def _records(self, n):
        from ragfin_tpu.data.models import IndexedChunk

        return [
            IndexedChunk(
                id=f"c{i}", text=f"chunk {i}", period="Q1_FY2024",
                chunk_type="profitability_analysis",
                statement_type="consolidated", primary_value=float(i),
            )
            for i in range(n)
        ]

    def test_bitwise_parity_prenormalized(self):
        """With pre-unit-norm input (normalize=False) every op is
        elementwise f32 with half-to-even rounding on both paths — the
        int8 matrix must be BITWISE identical. Scales may differ by 1 ulp
        (XLA lowers the f32 division to reciprocal-multiply; numpy does
        IEEE division) — the repair re-scores from f32 rows, so a 1-ulp
        scale wobble never reaches results."""
        rng = np.random.default_rng(7)
        x = rng.standard_normal((300, 64)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        recs = self._records(300)
        import jax.numpy as jnp

        dev = DeviceVectorIndex(
            x.copy(), recs, dtype=jnp.int8, normalize=False,
            pad_multiple=128, host_quantize=False,
        )
        host = DeviceVectorIndex(
            x.copy(), recs, dtype=jnp.int8, normalize=False,
            pad_multiple=128, host_quantize=True,
        )
        np.testing.assert_array_equal(np.asarray(dev.matrix_t), np.asarray(host.matrix_t))
        np.testing.assert_allclose(
            np.asarray(dev.scales), np.asarray(host.scales), rtol=2e-7, atol=0
        )
        np.testing.assert_array_equal(dev._exact_rows, host._exact_rows)

    def test_search_parity_normalized(self):
        """With normalize=True the two paths differ only by reduction
        order in the norm (1 ulp); searches must agree exactly on ids
        after the shared exact repair."""
        rng = np.random.default_rng(8)
        x = rng.standard_normal((512, 64)).astype(np.float32)
        recs = self._records(512)
        import jax.numpy as jnp

        dev = DeviceVectorIndex(
            x.copy(), recs, dtype=jnp.int8, pad_multiple=128, host_quantize=False
        )
        host = DeviceVectorIndex(
            x.copy(), recs, dtype=jnp.int8, pad_multiple=128, host_quantize=True
        )
        q = rng.standard_normal((5, 64)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        sd, idd = dev.search_embeddings(q, top_k=10)
        sh, idh = host.search_embeddings(q, top_k=10)
        np.testing.assert_array_equal(np.asarray(idd), np.asarray(idh))
        np.testing.assert_allclose(np.asarray(sd), np.asarray(sh), rtol=0, atol=1e-6)
