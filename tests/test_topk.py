"""Exactness tests for the cosine top-k tiers (dense / blocked / fused Pallas).

Kernel tests compare against a numpy oracle (SURVEY.md §4 test strategy); the
Pallas kernel runs in interpret mode on the CPU test mesh.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ragfin_tpu.ops.topk import (
    cosine_topk,
    cosine_topk_blocked,
    cosine_topk_dense,
    cosine_topk_fused,
)


def _numpy_oracle(q, ct, k, n_valid=None):
    scores = q @ ct
    if n_valid is not None:
        scores[:, n_valid:] = -np.inf
    # argsort descending, stable → ties break toward lower id.
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, order, axis=1), order


def _random_unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    corpus_t = _random_unit(rng, 1000, 64).T.copy()
    queries = _random_unit(rng, 9, 64)
    return queries, corpus_t


@pytest.mark.parametrize("k", [1, 3, 10])
class TestAgainstOracle:
    def test_dense(self, data, k):
        q, c = data
        s, i = cosine_topk_dense(jnp.asarray(q), jnp.asarray(c), k)
        es, ei = _numpy_oracle(q, c, k)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5, atol=1e-5)
        assert np.array_equal(np.asarray(i), ei)

    def test_blocked(self, data, k):
        q, c = data
        s, i = cosine_topk_blocked(jnp.asarray(q), jnp.asarray(c), k, block=192)
        es, ei = _numpy_oracle(q, c, k)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5, atol=1e-5)
        assert np.array_equal(np.asarray(i), ei)

    def test_fused(self, data, k):
        q, c = data
        s, i = cosine_topk_fused(jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=256)
        es, ei = _numpy_oracle(q, c, k)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5, atol=1e-5)
        assert np.array_equal(np.asarray(i), ei)

    @pytest.mark.parametrize("variant", ["carry", "mask", "twolevel", "mlazy"])
    def test_fused_merge_variants(self, data, k, variant):
        """All merge variants (carry / mask-extraction / two-level / mlazy)
        must agree with the oracle exactly; "mask" additionally exercises the
        tile-0 seed path, "twolevel" the sub-block maxima + staging-buffer
        extraction, "mlazy" the guarded lazy in-body extraction."""
        q, c = data
        s, i = cosine_topk_fused(
            jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=256, variant=variant
        )
        es, ei = _numpy_oracle(q, c, k)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5, atol=1e-5)
        assert np.array_equal(np.asarray(i), ei)

    @pytest.mark.parametrize("slice_n", [64, 128])
    def test_fused_sliced_merge(self, data, k, slice_n):
        """Sliced merge (per-slice guard + narrow while-loop passes) must
        agree with the oracle exactly, like the whole-tile merge."""
        q, c = data
        s, i = cosine_topk_fused(
            jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=256, slice_n=slice_n
        )
        es, ei = _numpy_oracle(q, c, k)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5, atol=1e-5)
        assert np.array_equal(np.asarray(i), ei)

    def test_fused_tiled_layout(self, data, k):
        """Tile-major [n_tiles, D, block_n] corpus (contiguous HBM DMAs)
        must agree with the oracle exactly, including the n_valid mask over
        the layout's zero-padded tail columns (1000 → 4×256)."""
        from ragfin_tpu.ops.topk import tile_corpus_t

        q, c = data
        tiles = tile_corpus_t(jnp.asarray(c), block_n=256)
        assert tiles.shape == (4, 64, 256)
        s, i = cosine_topk_fused(
            jnp.asarray(q), tiles, k, n_valid=c.shape[1], block_q=8
        )
        es, ei = _numpy_oracle(q, c, k)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5, atol=1e-5)
        assert np.array_equal(np.asarray(i), ei)

    def test_fused_tiled_int8_matches_flat_int8(self, data, k):
        from ragfin_tpu.ops.quantize import quantize_corpus_t
        from ragfin_tpu.ops.topk import (
            cosine_topk_fused_int8,
            tile_corpus_t,
            tile_scales,
        )

        q, c = data
        c8, sc = quantize_corpus_t(jnp.asarray(c))
        s_flat, i_flat = cosine_topk_fused_int8(
            jnp.asarray(q), c8, sc, k, block_q=8, block_n=256
        )
        s_t, i_t = cosine_topk_fused_int8(
            jnp.asarray(q),
            tile_corpus_t(c8, block_n=256),
            tile_scales(sc, block_n=256),
            k,
            n_valid=c.shape[1],
            block_q=8,
        )
        np.testing.assert_array_equal(np.asarray(i_flat), np.asarray(i_t))
        np.testing.assert_allclose(np.asarray(s_flat), np.asarray(s_t), rtol=1e-6)


class TestPadding:
    def test_n_valid_masks_padded_rows(self, data):
        q, c = data
        c_pad = np.concatenate([c, np.ones((c.shape[0], 24), np.float32)], axis=1)  # fake high-score pad
        for fn in (cosine_topk_dense, cosine_topk_blocked):
            s, i = fn(jnp.asarray(q), jnp.asarray(c_pad), 5, n_valid=c.shape[1])
            assert int(np.max(np.asarray(i))) < c.shape[1]
        s, i = cosine_topk_fused(jnp.asarray(q), jnp.asarray(c_pad), 5, n_valid=c.shape[1], block_q=8, block_n=256)
        assert int(np.max(np.asarray(i))) < c.shape[1]

    def test_query_count_not_multiple_of_block(self, data):
        q, c = data  # 9 queries with block_q=8 → padded query tile
        s, i = cosine_topk_fused(jnp.asarray(q), jnp.asarray(c), 4, block_q=8, block_n=256)
        assert s.shape == (9, 4) and i.shape == (9, 4)

    def test_adversarial_ascending_scores(self):
        """Worst case for the streaming merge: scores strictly increase with
        id, so every tile improves the running top-k k times."""
        rng = np.random.default_rng(5)
        d, n, k = 16, 1024, 7
        q = _random_unit(rng, 3, d)
        base = _random_unit(rng, n, d)
        # Sort corpus columns by score against query 0 → ascending ids win.
        order = np.argsort(q[0] @ base.T)
        c = base[order].T.copy()
        s, i = cosine_topk_fused(jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=128)
        es, ei = _numpy_oracle(q, c, k)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5, atol=1e-5)
        assert np.array_equal(np.asarray(i), ei)
        # Sliced merge must survive the every-slice-improves worst case too.
        ss, ii = cosine_topk_fused(
            jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=128, slice_n=32
        )
        assert np.array_equal(np.asarray(ii), ei)
        # Mask-extraction merge: every warm tile has a full candidate set.
        sm, im = cosine_topk_fused(
            jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=128, variant="mask"
        )
        assert np.array_equal(np.asarray(im), ei)
        # Two-level merge: every sub-block improves on the ascending corpus,
        # so the improving-block scan degenerates to visiting all of them.
        st, it = cosine_topk_fused(
            jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=256, variant="twolevel"
        )
        assert np.array_equal(np.asarray(it), ei)
        # mlazy: sub-block maxima prologue + lazy in-body extraction with
        # the boundary-tile validity guard — every sub-block improves here.
        sz, iz = cosine_topk_fused(
            jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=256, variant="mlazy"
        )
        assert np.array_equal(np.asarray(iz), ei)

    def test_tie_heavy_scores(self):
        """Quantized values produce massive exact-score ties; stable
        descending order (lowest id first) must hold across tile boundaries."""
        rng = np.random.default_rng(6)
        d, n, k = 8, 640, 9
        # Corpus columns drawn from only 4 distinct vectors → 4 score levels.
        pool = _random_unit(rng, 4, d)
        picks = rng.integers(0, 4, n)
        c = pool[picks].T.copy().astype(np.float32)
        q = _random_unit(rng, 2, d)
        s, i = cosine_topk_fused(jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=128)
        es, ei = _numpy_oracle(q, c, k)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5, atol=1e-5)
        assert np.array_equal(np.asarray(i), ei)
        sb, ib = cosine_topk_blocked(jnp.asarray(q), jnp.asarray(c), k, block=96)
        assert np.array_equal(np.asarray(ib), ei)
        # Exact ties spanning slice boundaries: the strict > slice guard must
        # not admit an equal-score higher-id candidate from a later slice.
        ss, ii = cosine_topk_fused(
            jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=128, slice_n=32
        )
        assert np.array_equal(np.asarray(ii), ei)
        # Mask merge under massive exact ties: the strict > hit test and the
        # ascending-id extraction order must reproduce the stable order.
        sm, im = cosine_topk_fused(
            jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=128, variant="mask"
        )
        assert np.array_equal(np.asarray(im), ei)
        # maxlazy merge: deferred id extraction must walk tie runs in
        # ascending id order via the prev_i carry (each tied id once).
        sl, il = cosine_topk_fused(
            jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=128, variant="maxlazy"
        )
        assert np.array_equal(np.asarray(il), ei)
        # Two-level merge under massive exact ties: ascending block order +
        # the strict > gate must reproduce the stable (score desc, id asc)
        # order across sub-block boundaries.
        s2, i2 = cosine_topk_fused(
            jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=256, variant="twolevel"
        )
        assert np.array_equal(np.asarray(i2), ei)
        # mlazy under massive exact ties: the guarded tie-run walk must
        # extract each tied id once in ascending order.
        s3, i3 = cosine_topk_fused(
            jnp.asarray(q), jnp.asarray(c), k, block_q=8, block_n=256, variant="mlazy"
        )
        assert np.array_equal(np.asarray(i3), ei)

    def test_k_greater_than_tiny_corpus(self):
        rng = np.random.default_rng(0)
        q = _random_unit(rng, 2, 16)
        c = _random_unit(rng, 4, 16).T.copy()
        s, i = cosine_topk_dense(jnp.asarray(q), jnp.asarray(c), 4)
        assert s.shape == (2, 4)


class TestDispatch:
    def test_auto_small_uses_dense(self, data):
        q, c = data
        s, i = cosine_topk(jnp.asarray(q), jnp.asarray(c), 3)
        es, ei = _numpy_oracle(q, c, 3)
        assert np.array_equal(np.asarray(i), ei)

    def test_unknown_method_raises(self, data):
        q, c = data
        with pytest.raises(ValueError):
            cosine_topk(jnp.asarray(q), jnp.asarray(c), 3, method="bogus")


class TestLargeQDefaults:
    """The production defaults are Q-dependent (ops/topk.py _default_variant /
    _default_blocks): batches of >=128 queries select the maxlazy merge at
    block_q=128 with per-dtype block_n winners. Pin the selection logic and
    run the default large-Q path (with a test-sized block_n) end to end."""

    def test_default_selection(self):
        from ragfin_tpu.ops.topk import _default_blocks, _default_variant

        assert _default_variant(jnp.int8, "fast", 64, 64) == "invariant"
        assert _default_variant(jnp.int8, "fast", 128, 128) == "maxlazy"
        assert _default_variant(jnp.bfloat16, "fast", 1024, 128) == "maxlazy"
        assert _default_variant(jnp.int8, "fast", None, 64) == "invariant"
        # maxlazy is tied to the block_q=128 regime: at bq=64 it measured a
        # regression, so the f32/exact tier (which keeps bq=64), and a
        # caller-pinned block_q=64 at large Q, stay invariant.
        assert _default_variant(jnp.float32, "exact", 1024, 64) == "invariant"
        assert _default_variant(jnp.bfloat16, "exact", 1024, 64) == "invariant"
        assert _default_variant(jnp.int8, "fast", 1024, 64) == "invariant"
        assert _default_blocks(jnp.int8, None, None, n_queries=1024) == (128, 6144)
        assert _default_blocks(jnp.int8, None, None, n_queries=64) == (64, 8192)
        assert _default_blocks(jnp.bfloat16, None, None, "fast", 1024) == (128, 4096)
        assert _default_blocks(jnp.bfloat16, None, None, "fast", 64) == (64, 6144)
        # The exact tier keeps f32 math and its own block budget at any Q.
        assert _default_blocks(jnp.float32, None, None, "exact", 1024) == (64, 2048)

    def test_default_large_q_path_matches_oracle(self):
        # f32/exact at qn >= 128: invariant merge, block_q=64 (the defaults
        # for this tier at any Q) — covers the padded-rows case qn=130.
        rng = np.random.default_rng(9)
        d, n, k, qn = 32, 700, 5, 130
        q = _random_unit(rng, qn, d)
        c = _random_unit(rng, n, d).T.copy()
        s, i = cosine_topk_fused(jnp.asarray(q), jnp.asarray(c), k, n_valid=n, block_n=256)
        es, ei = _numpy_oracle(q, c, k)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5, atol=1e-5)
        assert np.array_equal(np.asarray(i), ei)

    def test_default_large_q_bf16_fast_matches_dense_fast(self):
        # bf16 'fast' at qn >= 128 → maxlazy merge + block_q=128 on the
        # generic kernel (the headline large-Q bf16 production path);
        # compare against the dense fast path in the same bf16 score space.
        rng = np.random.default_rng(11)
        d, n, k, qn = 32, 700, 5, 200
        # Pre-round queries to bf16: the fused fast tier casts queries to
        # bf16 in-kernel while the dense path upcasts the corpus to the
        # query dtype, so bf16-rounded f32 queries put both paths in the
        # same product space on the CPU interpreter.
        q = jnp.asarray(_random_unit(rng, qn, d), jnp.bfloat16).astype(jnp.float32)
        c = jnp.asarray(_random_unit(rng, n, d).T.copy(), jnp.bfloat16)
        s, i = cosine_topk_fused(q, c, k, n_valid=n, block_n=256, precision="fast")
        sd, id_ = cosine_topk_dense(q, c, k, n_valid=n, precision="fast")
        np.testing.assert_allclose(np.asarray(s), np.asarray(sd), rtol=1e-5, atol=1e-6)
        assert np.array_equal(np.asarray(i), np.asarray(id_))

    def test_default_large_q_int8_matches_dense_int8(self):
        from ragfin_tpu.ops.quantize import quantize_corpus_t
        from ragfin_tpu.ops.topk import cosine_topk_dense_int8, cosine_topk_fused_int8

        rng = np.random.default_rng(10)
        d, n, k, qn = 32, 700, 5, 130
        q = jnp.asarray(_random_unit(rng, qn, d))
        c8, sc = quantize_corpus_t(jnp.asarray(_random_unit(rng, n, d).T.copy()))
        s8, i8 = cosine_topk_fused_int8(q, c8, sc, k, n_valid=n, block_n=256)
        sd, id_ = cosine_topk_dense_int8(q, c8, sc, k, n_valid=n)
        np.testing.assert_allclose(np.asarray(s8), np.asarray(sd), rtol=1e-5, atol=1e-6)
        assert np.array_equal(np.asarray(i8), np.asarray(id_))


class TestInt8:
    def test_agreement_with_f32(self, data):
        from ragfin_tpu.ops.quantize import quantize_corpus_t
        from ragfin_tpu.ops.topk import cosine_topk_fused_int8

        q, ct = data
        c8, sc = quantize_corpus_t(jnp.asarray(ct))
        s8, i8 = cosine_topk_fused_int8(jnp.asarray(q), c8, sc, 10, block_q=8, block_n=256)
        sf, if_ = cosine_topk_dense(jnp.asarray(q), jnp.asarray(ct), 10)
        # Random unit vectors are the adversarial case; require high overlap
        # of the top-10 SET and near-equal scores.
        overlap = np.mean([
            len(set(np.asarray(i8)[r]) & set(np.asarray(if_)[r])) / 10
            for r in range(i8.shape[0])
        ])
        assert overlap >= 0.8
        np.testing.assert_allclose(np.asarray(s8), np.asarray(sf), atol=2e-2)

    def test_quantize_roundtrip_error(self):
        from ragfin_tpu.ops.quantize import quantize_corpus_t

        rng = np.random.default_rng(1)
        ct = rng.standard_normal((64, 200)).astype(np.float32)
        c8, sc = quantize_corpus_t(jnp.asarray(ct))
        recon = np.asarray(c8, np.float32) * np.asarray(sc)
        assert np.abs(recon - ct).max() < np.abs(ct).max() / 100

    def test_int8_index_keeps_perfect_recall(self, reference_root):
        import os
        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.eval.datasets import load_qa_subset
        from ragfin_tpu.eval.harness import evaluate_retrieval
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        from ragfin_tpu.retrieval.queryfilter import FilteredSearch

        chunks = build_corpus(os.path.join(reference_root, "extract_data"))
        index = DeviceVectorIndex.build(chunks, dtype="int8")
        assert index.quantized
        qa = load_qa_subset(os.path.join(reference_root, "qa_subset.json"))
        # Production pipeline over the quantized index keeps perfect recall.
        s = evaluate_retrieval(FilteredSearch(index), qa, k=10).summary()
        assert s["retrieval_recall"]["mean"] == 1.0


class TestTies:
    def test_duplicate_corpus_rows_tie_break_to_lowest_id(self):
        """Identical chunks (exact score ties) must come back lowest-id-first
        from every tier, matching a stable descending sort."""
        rng = np.random.default_rng(9)
        base = _random_unit(rng, 40, 32)
        corpus = np.concatenate([base, base[:10]], axis=0)  # rows 40..49 dup 0..9
        ct = jnp.asarray(corpus.T.copy())
        q = jnp.asarray(base[:5])
        es, ei = _numpy_oracle(np.asarray(q), np.asarray(ct), 6)
        for fn, kw in (
            (cosine_topk_dense, {}),
            (cosine_topk_blocked, {"block": 16}),
            (cosine_topk_fused, {"block_q": 8, "block_n": 128}),
        ):
            s, i = fn(q, ct, 6, **kw)
            assert np.array_equal(np.asarray(i), ei), fn.__name__


class TestDenseInt8:
    def test_masked_search_matches_dequantized(self, data):
        from ragfin_tpu.ops.quantize import quantize_corpus_t
        from ragfin_tpu.ops.topk import cosine_topk_dense, cosine_topk_dense_int8

        q, ct = data
        c8, sc = quantize_corpus_t(jnp.asarray(ct))
        mask = np.zeros((ct.shape[1],), bool)
        mask[100:400] = True
        s8, i8 = cosine_topk_dense_int8(
            jnp.asarray(q), c8, sc, 5, row_mask=jnp.asarray(mask)
        )
        dq = jnp.asarray(c8, jnp.float32) * sc
        sf, if_ = cosine_topk_dense(jnp.asarray(q), dq, 5, row_mask=jnp.asarray(mask))
        # Same corpus values (the dequantized matrix), so ids must agree up to
        # query-quantization noise; all results must respect the mask.
        assert int(np.asarray(i8).min()) >= 100 and int(np.asarray(i8).max()) < 400
        overlap = np.mean([
            len(set(np.asarray(i8)[r]) & set(np.asarray(if_)[r])) / 5
            for r in range(q.shape[0])
        ])
        assert overlap >= 0.8

    def test_quantized_filtered_index_search(self, reference_root):
        import os

        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        chunks = build_corpus(os.path.join(reference_root, "extract_data"))
        idx = DeviceVectorIndex.build(chunks, dtype="int8")
        hits = idx.search_texts(
            ["net profit"], top_k=3, period="Q2_FY2024",
            chunk_type="profitability_analysis",
        )[0]
        assert len(hits) == 1
        assert hits[0].record.id == "icici_q2_fy2024_profitability_analysis"


class TestInt8ShadowRerank:
    """The int8 tier's exact host rerank (round-3 verdict #4 fix).

    int8 scan alone agrees with the f32 oracle only 0.972@10 at 1M/10M on
    random corpora (probe int8_quality_*: top-10 margins sit inside the
    per-element rounding); the host f32 re-score of the top-64 shortlist
    repairs id agreement to 1.000 with zero HBM cost. These tests pin the
    repaired path to the numpy oracle, including tie-breaks.
    """

    @staticmethod
    def _chunks(n):
        from ragfin_tpu.data.models import IndexedChunk

        return [
            IndexedChunk(
                id=f"c{i:04d}", text=f"chunk {i}", period="Q1_FY2024",
                chunk_type="profitability_analysis",
            )
            for i in range(n)
        ]

    @pytest.fixture(scope="class")
    def emb(self):
        rng = np.random.default_rng(7)
        base = _random_unit(rng, 480, 32)
        # Thin-margin band: rows 480..499 are tiny perturbations of rows
        # 0..19 — true order is well-defined at f32 but sits inside int8
        # rounding. Rows 500..507 duplicate rows 0..7 exactly.
        thin = base[:20] + 3e-4 * rng.standard_normal((20, 32)).astype(np.float32)
        thin /= np.linalg.norm(thin, axis=1, keepdims=True)
        # Exact duplicates: tie-break coverage (lowest id must win).
        dup = base[:8].copy()
        return np.concatenate([base, thin, dup], axis=0)

    def test_rerank_matches_f32_oracle_with_ties(self, emb):
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        idx = DeviceVectorIndex(
            emb, self._chunks(len(emb)), dtype="int8", pad_multiple=128
        )
        assert idx.quantized and idx._exact_rows is not None
        q = jnp.asarray(emb[:6])  # queries near the thin-margin band
        s, i = idx.search_embeddings(q, top_k=10)
        es, ei = _numpy_oracle(np.asarray(q), idx._exact_rows.T, 10)
        assert np.array_equal(np.asarray(i), ei)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5)

    def test_shadow_off_falls_back_to_raw_int8(self, emb):
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        idx = DeviceVectorIndex(
            emb, self._chunks(len(emb)), dtype="int8", pad_multiple=128,
            int8_shadow=False,
        )
        assert idx._exact_rows is None
        s, i = idx.search_embeddings(jnp.asarray(emb[:3]), top_k=5)
        i = np.asarray(i)
        assert i.shape == (3, 5)
        # The raw tier may order a query's own row, its exact duplicate, and
        # its thin-margin variant arbitrarily (that noise is exactly what
        # the shadow repairs) — but the top hit must be one of that family.
        for r, fam in enumerate(({0, 480, 500}, {1, 481, 501}, {2, 482, 502})):
            assert int(i[r, 0]) in fam
            assert float(np.asarray(s)[r, 0]) > 0.98


class TestInt8FilteredRepair:
    """Round-4 extension of the shadow repair to the FILTERED and
    tier-group int8 paths: without it, a semantic backend (no sparse
    re-rank) over a quantized index serves dequantized-int8 order for any
    masked or tiered search."""

    @pytest.fixture(scope="class")
    def idx(self):
        from ragfin_tpu.data.models import IndexedChunk
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        rng = np.random.default_rng(11)
        base = _random_unit(rng, 480, 32)
        thin = base[:20] + 3e-4 * rng.standard_normal((20, 32)).astype(np.float32)
        thin /= np.linalg.norm(thin, axis=1, keepdims=True)
        emb = np.concatenate([base, thin, base[:8].copy()], axis=0)
        chunks = [
            IndexedChunk(
                id=f"c{i:04d}", text=f"chunk {i}",
                period="Q1_FY2024" if i % 2 == 0 else "Q2_FY2024",
                chunk_type="profitability_analysis",
            )
            for i in range(len(emb))
        ]
        idx = DeviceVectorIndex(emb, chunks, dtype="int8", pad_multiple=128)
        # direct-search surface: encode queries as raw embeddings
        self_emb = emb

        class _RawEmbedder:
            featurizer = None

            def encode_texts(self_inner, texts):
                return np.stack([self_emb[int(t)] for t in texts])

        idx.embedder = _RawEmbedder()
        return idx, emb

    def test_filtered_search_matches_masked_oracle(self, idx):
        index, emb = idx
        even_rows = np.arange(index.n) % 2 == 0
        masked = index._exact_rows.copy()
        masked[~even_rows] = 0  # zero rows can never reach a positive top-10
        hits = index.search_texts([str(i) for i in range(4)], top_k=10,
                                  period="Q1_FY2024")
        es, ei = _numpy_oracle(emb[:4], masked.T, 10)
        for qi in range(4):
            got = [int(h.id[1:]) for h in hits[qi]]
            assert got == list(ei[qi]), f"query {qi}: {got} != {list(ei[qi])}"
            np.testing.assert_allclose(
                [h.score for h in hits[qi]], es[qi], rtol=1e-5
            )

    def test_tier_group_matches_filtered(self, idx):
        index, _ = idx
        qs = [str(i) for i in range(3)]
        tiers = [dict(period="Q1_FY2024"), dict(period="Q2_FY2024")]
        grouped = index.search_texts_tiers(qs, tiers, top_k=8)
        for ti, flt in enumerate(tiers):
            solo = index.search_texts(qs, top_k=8, **flt)
            for qi in range(len(qs)):
                assert [h.id for h in grouped[ti][qi]] == [h.id for h in solo[qi]]


class TestInt8EmptyIndex:
    """An empty quantized index must return empty results, not crash in
    the exact repair's fancy-index (review finding: n=0 + int8_shadow=True
    raised IndexError on every filtered search)."""

    def _empty(self):
        from ragfin_tpu.index.vector_index import DeviceVectorIndex
        from ragfin_tpu.models.embedder import HashedEmbedder
        from ragfin_tpu.models.featurizer import HashedFeaturizer

        idx = DeviceVectorIndex(
            np.zeros((0, 384), np.float32), [], dtype="int8", pad_multiple=128
        )
        feat = HashedFeaturizer()
        feat.fit(["placeholder vocabulary text"])
        idx.embedder = HashedEmbedder(featurizer=feat)
        idx.featurizer = feat
        return idx

    def test_unfiltered_empty(self):
        idx = self._empty()
        s, i = idx.search_embeddings(np.zeros((2, 384), np.float32), top_k=3)
        assert np.asarray(s).shape[0] == 2

    def test_filtered_empty(self):
        idx = self._empty()
        assert idx.search_texts(["anything"], top_k=3, period="Q1_FY2024") == [[]]

    def test_tiers_empty(self):
        idx = self._empty()
        out = idx.search_texts_tiers(["anything"], [dict(period="Q1_FY2024")], top_k=3)
        assert out == [[[]]]
