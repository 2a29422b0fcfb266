"""IVF cluster-pruned tier (ops/ivf.py) — TPU-native IVF_FLAT equivalent.

Reference semantics: Milvus IVF_FLAT nlist/nprobe (`chunking_storing
(1).py:29`). Exhaustive probing must equal the exact oracle; pruned probing
is measured for recall on clustered data (the regime IVF exists for).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ragfin_tpu.ops.ivf import build_ivf, ivf_topk
from ragfin_tpu.ops.topk import _INT_MAX


def _numpy_oracle(q, ct, k):
    scores = q @ ct
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, order, axis=1), order


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def clustered():
    """20 well-separated clusters of 100 points each (64-dim)."""
    rng = np.random.default_rng(7)
    centers = _unit(rng, 20, 64) * 4.0
    pts = np.concatenate(
        [c + 0.3 * rng.standard_normal((100, 64)).astype(np.float32) for c in centers]
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    order = rng.permutation(len(pts))  # shuffle so build must recover structure
    queries = _unit(rng, 16, 64) + 0  # random directions
    # Also craft queries near cluster centers (the realistic case).
    near = centers[:8] / np.linalg.norm(centers[:8], axis=1, keepdims=True)
    queries = np.concatenate([queries[:8], near]).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return queries, pts[order].T.copy()  # [D, N=2000]


class TestBuild:
    def test_balanced_cells_and_pad_tail(self, clustered):
        _, ct = clustered  # N=2000, cell=256 -> 8 cells, 48 pads
        idx = build_ivf(jnp.asarray(ct), cell=256, iters=2)
        assert idx.cells.shape == (8, 64, 256)
        assert idx.n_valid == 2000
        ids = np.asarray(idx.orig_ids)
        assert np.all(ids[2000:] == _INT_MAX)  # pads at the permuted tail
        real = ids[:2000]
        assert sorted(real.tolist()) == list(range(2000))  # a true permutation

    def test_quantized_build(self, clustered):
        _, ct = clustered
        idx = build_ivf(jnp.asarray(ct), cell=256, iters=1, quantize=True)
        assert idx.cells.dtype == jnp.int8
        assert idx.scales.shape == (8, 1, 256)


class TestSearch:
    def test_exhaustive_probing_matches_oracle(self, clustered):
        """nprobe == n_cells scans everything: exact-oracle parity, including
        tie-breaks, modulo the permutation (ids are mapped back)."""
        q, ct = clustered
        idx = build_ivf(jnp.asarray(ct), cell=256, iters=2)
        s, i = ivf_topk(jnp.asarray(q), idx, k=10, nprobe=idx.n_cells, block_q=8)
        es, ei = _numpy_oracle(q, ct, 10)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-4, atol=1e-5)
        # Scores are exact; ids may differ only on exact-score ties (the
        # permuted tie order differs from original-id order).
        both = np.asarray(s) - es
        assert np.max(np.abs(both)) < 1e-4
        match = (np.asarray(i) == ei).mean()
        assert match > 0.95

    @staticmethod
    def _clustered_queries(ct, n_q=64, seed=11):
        """Queries near corpus points — the workload IVF exists for (real
        embedding batches live on the corpus manifold, not random space)."""
        rng = np.random.default_rng(seed)
        base = ct.T[rng.integers(0, ct.shape[1], n_q)]
        q = base + 0.1 * rng.standard_normal(base.shape).astype(np.float32)
        return (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)

    def test_pruned_recall_on_clustered_queries(self, clustered):
        _, ct = clustered
        q = self._clustered_queries(ct)
        idx = build_ivf(jnp.asarray(ct), cell=256, iters=3)
        s, i = ivf_topk(jnp.asarray(q), idx, k=10, nprobe=4, block_q=8)
        _, ei = _numpy_oracle(q, ct, 10)
        got = np.asarray(i)
        recall = np.mean([len(set(got[r]) & set(ei[r])) / 10 for r in range(len(q))])
        assert recall >= 0.9, f"recall@10 {recall} with nprobe=4/8"

    def test_int8_pruned_search(self, clustered):
        _, ct = clustered
        q = self._clustered_queries(ct, seed=12)
        idx = build_ivf(jnp.asarray(ct), cell=256, iters=2, quantize=True)
        s, i = ivf_topk(jnp.asarray(q), idx, k=5, nprobe=4, block_q=8)
        _, ei = _numpy_oracle(q, ct, 5)
        got = np.asarray(i)
        recall = np.mean([len(set(got[r]) & set(ei[r])) / 5 for r in range(len(q))])
        assert recall >= 0.85, f"recall@5 {recall}"

    def test_diverse_queries_need_wider_probing(self, clustered):
        """Random-direction queries are the IVF worst case: recall recovers
        monotonically as nprobe grows toward exhaustive."""
        q, ct = clustered
        idx = build_ivf(jnp.asarray(ct), cell=256, iters=3)
        _, ei = _numpy_oracle(q, ct, 10)
        recalls = []
        for nprobe in (2, 8):
            _, i = ivf_topk(jnp.asarray(q), idx, k=10, nprobe=nprobe, block_q=8)
            got = np.asarray(i)
            recalls.append(
                np.mean([len(set(got[r]) & set(ei[r])) / 10 for r in range(len(q))])
            )
        assert recalls[-1] == 1.0  # nprobe == n_cells: exhaustive
        assert recalls[0] <= recalls[-1]

    def test_ivf_index_class_roundtrip(self, clustered, tmp_path):
        """IVFVectorIndex: from_dense on the real 16-chunk corpus, text
        search through the embedder, save/load identity."""
        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.index.ivf_index import IVFVectorIndex
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        dense = DeviceVectorIndex.build(build_corpus("/root/reference/extract_data"))
        ivf = IVFVectorIndex.from_dense(dense, cell=8, nprobe=2, iters=2)
        assert ivf.stats()["index_type"] == "IVF_BALANCED"
        hits = ivf.search_texts(["net profit Q1 FY2024"], top_k=3)[0]
        assert hits and hits[0].record.chunk_type == "profitability_analysis"

        ivf.save(str(tmp_path / "ivf"))
        back = IVFVectorIndex.load(str(tmp_path / "ivf"))
        h2 = back.search_texts(["net profit Q1 FY2024"], top_k=3)[0]
        assert [h.id for h in h2] == [h.id for h in hits]

    def test_ivf_index_int8_roundtrip(self, clustered, tmp_path):
        _, ct = clustered
        from ragfin_tpu.data.models import IndexedChunk
        from ragfin_tpu.index.ivf_index import IVFVectorIndex

        records = [
            IndexedChunk(
                id=f"c{i}", text=f"chunk {i}", period="Q1_FY2024",
                chunk_type="profitability_analysis", statement_type="consolidated",
                primary_value=float(i),
            )
            for i in range(ct.shape[1])
        ]
        ivf = IVFVectorIndex.build(
            ct.T.copy(), records, cell=256, nprobe=3, iters=2, quantize=True
        )
        q = self._clustered_queries(ct, n_q=4, seed=3)
        s, i = ivf.search_embeddings(q, top_k=5)
        ivf.save(str(tmp_path / "ivf8"))
        back = IVFVectorIndex.load(str(tmp_path / "ivf8"))
        s2, i2 = back.search_embeddings(q, top_k=5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))

    def test_ivf_tuned_encoder_roundtrip(self, tmp_path):
        """A fine-tuned projection table must survive IVF save/load: the
        table cannot be regenerated from the seed, and before the round-3
        fix load() raised and the engine silently rebuilt untuned."""
        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.index.ivf_index import IVFVectorIndex
        from ragfin_tpu.index.vector_index import DeviceVectorIndex
        from ragfin_tpu.models.bag_encoder import BagEncoder, init_table

        base = BagEncoder()
        rng = np.random.default_rng(7)
        tuned_table = np.asarray(base.table) + 0.01 * rng.standard_normal(
            (base.vocab_size, base.dim)
        ).astype(np.float32)
        tuned = BagEncoder(table=jnp.asarray(tuned_table))
        assert tuned.tuned

        dense = DeviceVectorIndex.build(
            build_corpus("/root/reference/extract_data"), encoder=tuned
        )
        ivf = IVFVectorIndex.from_dense(dense, cell=8, nprobe=8, iters=2)
        hits = ivf.search_texts(["net profit Q1 FY2024"], top_k=3)[0]

        ivf.save(str(tmp_path / "ivf_tuned"))
        back = IVFVectorIndex.load(str(tmp_path / "ivf_tuned"))
        assert back.encoder is not None and back.encoder.tuned
        np.testing.assert_array_equal(
            np.asarray(back.encoder.table), np.asarray(tuned.table)
        )
        h2 = back.search_texts(["net profit Q1 FY2024"], top_k=3)[0]
        assert [h.id for h in h2] == [h.id for h in hits]

    def test_query_count_not_block_multiple(self, clustered):
        q, ct = clustered
        idx = build_ivf(jnp.asarray(ct), cell=256, iters=1)
        s, i = ivf_topk(jnp.asarray(q[:5]), idx, k=3, nprobe=3, block_q=8)
        assert s.shape == (5, 3) and i.shape == (5, 3)
        assert int(np.max(np.asarray(i))) < 2000  # never a pad id


class TestExactRepair:
    """IVF host exact rerank (round-4 verdict #3): full probe + repair must
    EQUAL exact search — ids, scores, and tie-breaks — because full probe
    scans every cell and the repair replaces kernel-precision scores with
    exact f32 host scores under the oracle tie-break. The round-4 residual
    (full-probe overlap 0.795 on trained embeddings) was precisely this
    epsilon + tie degeneracy."""

    def _tie_corpus(self, seed=5, n=1024, d=64, dupes=6):
        """Corpus with exact-duplicate row groups (tie degeneracy: the
        trained encoder's collapse_numbers maps figure-perturbed template
        chunks to identical embeddings)."""
        rng = np.random.default_rng(seed)
        base = _unit(rng, n, d)
        # Duplicate the first `dupes` rows 4x at scattered positions.
        stride = max(n // 4, dupes)
        for g in range(dupes):
            for rep in range(1, 4):
                base[g + rep * stride] = base[g]
        return base

    def _oracle(self, q, rows, k):
        """numpy exact oracle with the production tie-break (stable
        score-descending, lowest id wins)."""
        scores = q @ rows.T
        order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(scores, order, axis=1), order

    def test_full_probe_plus_repair_equals_exact_int8(self):
        from ragfin_tpu.data.models import IndexedChunk
        from ragfin_tpu.index.ivf_index import IVFVectorIndex

        rows = self._tie_corpus()
        records = [
            IndexedChunk(
                id=f"c{i}", text=f"chunk {i}", period="Q1_FY2024",
                chunk_type="profitability_analysis", statement_type="consolidated",
                primary_value=float(i),
            )
            for i in range(rows.shape[0])
        ]
        ivf = IVFVectorIndex.build(rows.copy(), records, cell=128, iters=2, quantize=True)
        assert ivf._exact_rows is not None
        rng = np.random.default_rng(8)
        # Queries AT duplicated rows: top-k contains exact-tie groups.
        q = rows[[0, 1, 2, 100, 101, 3]] + 0.01 * rng.standard_normal((6, rows.shape[1]))
        q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
        s, i = ivf.search_embeddings(q, top_k=10, nprobe=ivf.ivf.n_cells)
        es, ei = self._oracle(q, np.asarray(ivf._exact_rows), 10)
        np.testing.assert_array_equal(np.asarray(i), ei)
        np.testing.assert_allclose(np.asarray(s), es, rtol=1e-6, atol=1e-6)

    def test_wide_tie_group_beyond_shortlist(self):
        """Round-5 residual: a tie group WIDER than the repair shortlist
        (measured 417 identical rows across the rank-10 boundary at 1M
        trained distractors). The kernel returns an arbitrary 16 of the
        group (permuted-position tie-break); only the duplicate-group
        expansion can recover the oracle's lowest-original-id members."""
        from ragfin_tpu.data.models import IndexedChunk
        from ragfin_tpu.index.ivf_index import IVFVectorIndex

        rng = np.random.default_rng(11)
        n, d = 1024, 64
        rows = _unit(rng, n, d)
        # One 60-member exact-duplicate group scattered over the id space
        # (so it spans many cells after clustering).
        dup_positions = rng.choice(np.arange(1, n), size=59, replace=False)
        for p in dup_positions:
            rows[p] = rows[0]
        records = [
            IndexedChunk(
                id=f"c{i}", text=f"chunk {i}", period="Q1_FY2024",
                chunk_type="profitability_analysis", statement_type="consolidated",
                primary_value=float(i),
            )
            for i in range(n)
        ]
        for quantize in (False, True):
            ivf = IVFVectorIndex.build(
                rows.copy(), records, cell=128, iters=2, quantize=quantize
            )
            # Query NEAR the duplicated row: its 60-member group floods the
            # top-10 and the boundary falls inside the group.
            q = rows[[0]] + 0.01 * rng.standard_normal((1, d))
            q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
            s, i = ivf.search_embeddings(q, top_k=10, nprobe=ivf.ivf.n_cells)
            es, ei = self._oracle(q, np.asarray(ivf._exact_rows), 10)
            np.testing.assert_array_equal(np.asarray(i), ei)
            np.testing.assert_allclose(np.asarray(s), es, rtol=1e-6, atol=1e-6)

    def test_dup_groups_from_rows(self):
        from ragfin_tpu.index.ivf_index import _dup_groups_from_rows

        rng = np.random.default_rng(3)
        rows = rng.standard_normal((50, 8)).astype(np.float32)
        rows[17] = rows[40] = rows[4]   # group {4, 17, 40}
        rows[33] = rows[9]              # group {9, 33}
        dg = _dup_groups_from_rows(rows)
        assert dg is not None
        member_ids, member_group, offs, gids = dg
        assert sorted(member_ids.tolist()) == [4, 9, 17, 33, 40]
        groups = {}
        for m, g in zip(member_ids, member_group):
            groups.setdefault(int(g), []).append(int(m))
        assert sorted(map(sorted, groups.values())) == [[4, 17, 40], [9, 33]]
        # Per-group expansion lists are the ascending member ids.
        stored = {tuple(gids[offs[g]:offs[g + 1]].tolist()) for g in set(member_group.tolist())}
        assert stored == {(4, 17, 40), (9, 33)}
        # No duplicates -> None.
        assert _dup_groups_from_rows(rng.standard_normal((20, 8))) is None

    def test_repair_off_matches_raw_kernel(self):
        from ragfin_tpu.data.models import IndexedChunk
        from ragfin_tpu.index.ivf_index import IVFVectorIndex

        rows = self._tie_corpus(seed=6)
        records = [
            IndexedChunk(
                id=f"c{i}", text=f"chunk {i}", period="Q1_FY2024",
                chunk_type="financial_ratios", statement_type="consolidated",
                primary_value=float(i),
            )
            for i in range(rows.shape[0])
        ]
        ivf = IVFVectorIndex.build(rows.copy(), records, cell=128, iters=1, quantize=True)
        q = rows[:4]
        s_raw, i_raw = ivf.search_embeddings(q, top_k=5, exact_repair=False)
        s_k, i_k = ivf_topk(jnp.asarray(q, jnp.float32), ivf.ivf, 5, nprobe=ivf.nprobe, block_q=8)
        np.testing.assert_array_equal(np.asarray(i_raw), np.asarray(i_k))

    def test_exact_rows_survive_save_load(self, tmp_path):
        from ragfin_tpu.data.models import IndexedChunk
        from ragfin_tpu.index.ivf_index import IVFVectorIndex

        rows = self._tie_corpus(seed=7, n=256)
        records = [
            IndexedChunk(
                id=f"c{i}", text=f"chunk {i}", period="Q2_FY2024",
                chunk_type="segment_analysis", statement_type="consolidated",
                primary_value=float(i),
            )
            for i in range(rows.shape[0])
        ]
        ivf = IVFVectorIndex.build(rows.copy(), records, cell=64, iters=1, quantize=True)
        ivf.save(str(tmp_path / "ivfrr"))
        back = IVFVectorIndex.load(str(tmp_path / "ivfrr"))
        assert back._exact_rows is not None
        assert back.stats()["exact_repair"] is True
        q = rows[:3]
        s1, i1 = ivf.search_embeddings(q, top_k=5, nprobe=ivf.ivf.n_cells)
        s2, i2 = back.search_embeddings(q, top_k=5, nprobe=back.ivf.n_cells)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_no_shadow_opt_out(self):
        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.index.ivf_index import IVFVectorIndex
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        dense = DeviceVectorIndex.build(build_corpus("/root/reference/extract_data"))
        ivf = IVFVectorIndex.from_dense(dense, cell=8, nprobe=8, iters=1, exact_shadow=False)
        assert ivf._exact_rows is None
        assert ivf.stats()["exact_repair"] is False
        hits = ivf.search_texts(["net profit Q1 FY2024"], top_k=3)[0]
        assert hits

    def test_from_dense_reuses_dense_shadow(self):
        """A quantized dense index already holds f32 shadow rows — from_dense
        must reuse them (no device→host transfer, bitwise-identical repair
        basis across tiers)."""
        from ragfin_tpu.data.models import IndexedChunk
        from ragfin_tpu.index.ivf_index import IVFVectorIndex
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        rows = self._tie_corpus(seed=9, n=256)
        records = [
            IndexedChunk(
                id=f"c{i}", text=f"chunk {i}", period="Q3_FY2024",
                chunk_type="balance_sheet_analysis", statement_type="consolidated",
                primary_value=float(i),
            )
            for i in range(rows.shape[0])
        ]
        dense = DeviceVectorIndex(rows.copy(), records, dtype=jnp.int8)
        ivf = IVFVectorIndex.from_dense(dense, cell=64, iters=1)
        assert ivf._exact_rows is dense._exact_rows


class TestEngineIntegration:
    def test_engine_serves_ivf_index(self, reference_root):
        """RAGFIN_INDEX_TYPE=ivf: the engine builds an IVFVectorIndex (the
        reference's IVF_FLAT semantics) and the vector path serves queries
        through it — text encoding via the carried featurizer/encoder."""
        from ragfin_tpu.config.settings import Settings
        from ragfin_tpu.index.ivf_index import IVFVectorIndex
        from ragfin_tpu.serving.engine import RagFinEngine

        settings = Settings(
            default_model="fake",
            data_dir=f"{reference_root}/extract_data",
            index_dir="",
            index_type="ivf",
            ivf_nprobe=1,  # 16 chunks -> a single cell
        )
        engine = RagFinEngine(settings)
        assert isinstance(engine.vector_index, IVFVectorIndex)
        # Question-formed query: the trained encoder is trained on question
        # phrasings (bare keyword fragments are a known v4 weak spot — see
        # BENCH_NOTES round-5 notes); the integration assert pins the exact
        # gold chunk, which is stronger than the old chunk_type check.
        hits = engine.vector_index.search_texts(
            ["How did net profit grow in Q1 FY2024?"], top_k=3
        )[0]
        assert hits and hits[0].record.id == "icici_q1_fy2024_profitability_analysis"
        # VectorRAG must drop to raw search (no filter kwargs on IVF).
        assert engine.vector_rag._searcher is None
        import asyncio

        out = asyncio.run(
            engine.vector_rag.search_and_answer(
                "What was the net profit in Q1 FY2024?", 3
            )
        )
        assert out.get("contexts"), out

    def test_cli_build_ivf_and_query(self, reference_root, tmp_path, capsys):
        from ragfin_tpu.cli import main

        idx = tmp_path / "ivfidx"
        rc = main([
            "build-index", "--data", f"{reference_root}/extract_data",
            "--out", str(idx), "--index-type", "ivf", "--nprobe", "1",
        ])
        assert rc == 0
        assert (idx / "ivf.json").exists()
        capsys.readouterr()
        rc = main([
            "query", "What was ICICI Bank's net profit in Q1 FY2024?",
            "--mode", "vector", "--data", f"{reference_root}/extract_data",
            "--index", str(idx),
        ])
        assert rc == 0
        import json

        out = json.loads(capsys.readouterr().out)
        ids = [c["id"] for c in out["contexts"]]
        assert "icici_q1_fy2024_profitability_analysis" in ids


class TestMixedBatchProbing:
    def test_default_blockq_protects_mixed_batches(self, clustered):
        """Round-2 verdict Weak #5: a mixed large batch must not silently
        collapse recall by sharing one probe list across 128 diverse
        queries. The production default (block_q=8 at every batch size)
        must be at least as good as the old large-tile behavior."""
        import jax.numpy as jnp

        from ragfin_tpu.ops.ivf import build_ivf, ivf_topk

        q, ct = clustered
        rng = np.random.default_rng(9)
        idx = build_ivf(jnp.asarray(ct), cell=256, iters=2)
        # 256 queries near random corpus points — maximally mixed
        pts = ct.T
        qs = pts[rng.integers(0, pts.shape[0], 256)] + 0.05 * rng.standard_normal((256, pts.shape[1]))
        qs = (qs / np.linalg.norm(qs, axis=1, keepdims=True)).astype(np.float32)
        exact = np.argsort(-(qs @ pts.T), axis=1)[:, :10]

        def recall(block_q):
            _, i = ivf_topk(jnp.asarray(qs), idx, k=10, nprobe=4, block_q=block_q)
            got = np.asarray(i)
            return np.mean([len(set(got[r]) & set(exact[r])) / 10 for r in range(len(qs))])

        assert recall(8) >= recall(128) - 0.01


class TestTieAwareAgreement:
    """Pure-function tests for eval.harness.tie_aware_agreement — the
    exact-scale tie metric (round-4 gap: the old script compared IVF's int8
    cell scores against the exact f32 floor; this one never sees an
    approximate score at all)."""

    def test_exact_match_is_perfect(self):
        from ragfin_tpu.eval.harness import tie_aware_agreement

        wide = [[(f"c{i}", 1.0 - 0.01 * i) for i in range(20)]]
        approx = [[f"c{i}" for i in range(10)]]
        overlap, tie, trunc = tie_aware_agreement(wide, approx, k=10)
        assert overlap == 1.0 and tie == 1.0 and trunc == 0

    def test_tie_member_swap_counts_for_tie_metric_only(self):
        from ragfin_tpu.eval.harness import tie_aware_agreement

        # Ranks 5..14 all tie at the k-th score: swapping rank 9 for rank 12
        # is an equally-correct answer — overlap drops, tie-aware does not.
        scores = [1.0 - 0.01 * i for i in range(5)] + [0.5] * 10 + [0.1] * 5
        wide = [[(f"c{i}", s) for i, s in enumerate(scores)]]
        approx = [[f"c{i}" for i in range(9)] + ["c12"]]
        overlap, tie, trunc = tie_aware_agreement(wide, approx, k=10)
        assert overlap == 0.9
        assert tie == 1.0
        assert trunc == 0

    def test_genuine_miss_fails_both(self):
        from ragfin_tpu.eval.harness import tie_aware_agreement

        wide = [[(f"c{i}", 1.0 - 0.01 * i) for i in range(20)]]
        approx = [[f"c{i}" for i in range(9)] + ["c19"]]  # 0.81 << floor 0.91
        overlap, tie, _ = tie_aware_agreement(wide, approx, k=10)
        assert overlap == 0.9 and tie == 0.9

    def test_truncated_tie_group_reported(self):
        from ragfin_tpu.eval.harness import tie_aware_agreement

        # Every wide slot ties: the group may extend past the list.
        wide = [[(f"c{i}", 0.5) for i in range(16)]]
        approx = [[f"c{i}" for i in range(10)]]
        _, tie, trunc = tie_aware_agreement(wide, approx, k=10)
        assert tie == 1.0 and trunc == 1

    def test_empty_query_skipped(self):
        from ragfin_tpu.eval.harness import tie_aware_agreement

        overlap, tie, trunc = tie_aware_agreement([[]], [[]], k=10)
        assert overlap == 0.0 and tie == 0.0 and trunc == 0

    def test_long_approx_list_capped_at_k(self):
        from ragfin_tpu.eval.harness import tie_aware_agreement

        # 15-wide tie group; a caller passing a 15-long approx list must not
        # score above 1.0 (round-4 advisor: len(a & tie_set) was unbounded).
        wide = [[(f"c{i}", 0.5) for i in range(15)] + [("c15", 0.1)]]
        approx = [[f"c{i}" for i in range(15)]]
        overlap, tie, _ = tie_aware_agreement(wide, approx, k=10)
        assert overlap == 1.0 and tie == 1.0

    def test_exhausted_corpus_not_flagged_truncated(self):
        from ragfin_tpu.eval.harness import tie_aware_agreement

        # The exact search asked for wide=128 but the corpus only has 16
        # candidates: the tie group is COMPLETE even though the last score
        # ties (round-4 advisor: truncation false-positive).
        wide_list = [[(f"c{i}", 0.5) for i in range(16)]]
        approx = [[f"c{i}" for i in range(10)]]
        _, tie, trunc = tie_aware_agreement(wide_list, approx, k=10, wide=128)
        assert tie == 1.0 and trunc == 0
        # Same list, wide actually reached: still flagged.
        _, _, trunc2 = tie_aware_agreement(wide_list, approx, k=10, wide=16)
        assert trunc2 == 1
