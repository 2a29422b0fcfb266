"""Tests for the from-scratch in-domain semantic encoder stack (C4/T1):
vocab building, pair generation, training loop, checkpoint IO, embedder
backend wiring."""

import os

import numpy as np
import pytest

from ragfin_tpu.models.pairgen import (
    VOCAB_SEED_WORDS,
    corpus_sample,
    make_pair,
    pair_batch,
)
from ragfin_tpu.models.tokenizer import (
    WordPieceTokenizer,
    build_wordpiece_vocab,
    number_shape,
)


class TestNumberShape:
    def test_scope_numbers_stay_literal(self):
        assert number_shape("2024") == "2024"
        assert number_shape("1999") == "1999"
        assert number_shape("3") == "3"
        assert number_shape("42") == "42"

    def test_data_values_collapse(self):
        assert number_shape("44.0") == "numdec"
        assert number_shape("10636") == "num5"
        assert number_shape("123456789012") == "num9"
        assert number_shape("800") == "num3"

    def test_collapse_in_tokenizer(self):
        tok = WordPieceTokenizer(vocab=None, collapse_numbers=True)
        toks = tok._basic_tokens("NET PROFIT: ₹10,636.5 crore in Q1 FY2024")
        assert "numdec" in toks
        assert "2024" in " ".join(toks) or "fy2024" in toks
        assert "10636" not in toks  # comma-collapsed then shaped

    def test_no_collapse_default(self):
        tok = WordPieceTokenizer(vocab=None)
        toks = tok._basic_tokens("profit 10,636.5")
        assert "numdec" not in toks


class TestVocabBuild:
    def test_deterministic(self):
        texts = corpus_sample(50, seed=3)
        v1 = build_wordpiece_vocab(texts, vocab_size=4096)
        v2 = build_wordpiece_vocab(texts, vocab_size=4096)
        assert v1 == v2

    def test_contains_domain_and_seed_words(self):
        vocab = build_wordpiece_vocab(corpus_sample(200, seed=0), vocab_size=8192)
        # number collapsing splits "fy2024" into "fy" + the year literal
        for word in ("profit", "icici", "fy", "2024", "lucrative", "parked", "between"):
            assert word in vocab, word
        # char floor: ascii letters + continuations always present
        assert "a" in vocab and "##a" in vocab

    def test_specials_first(self):
        vocab = build_wordpiece_vocab(["alpha beta"], vocab_size=256)
        assert vocab["[PAD]"] == 0
        assert vocab["[UNK]"] == 1
        assert vocab["[CLS]"] == 2
        assert vocab["[SEP]"] == 3

    def test_save_load_roundtrip(self, tmp_path):
        vocab = build_wordpiece_vocab(corpus_sample(20, seed=1), vocab_size=2048)
        tok = WordPieceTokenizer(vocab=vocab, collapse_numbers=True)
        path = str(tmp_path / "vocab.txt")
        tok.save_vocab(path)
        tok2 = WordPieceTokenizer.from_vocab_file(path, collapse_numbers=True)
        assert tok2.vocab == vocab
        text = "ICICI Bank net profit Q3 FY2024 ₹9,648 crore"
        assert tok.encode(text) == tok2.encode(text)

    def test_oov_words_decompose_not_unk(self):
        vocab = build_wordpiece_vocab(corpus_sample(50, seed=0), vocab_size=4096)
        tok = WordPieceTokenizer(vocab=vocab, collapse_numbers=True)
        ids = tok.encode("xylophone zeitgeist")
        assert tok.unk_id not in ids


class TestPairGen:
    def test_pair_shapes(self):
        r = np.random.default_rng(0)
        q, d, cell = make_pair(r, "quarter")
        assert isinstance(q, str) and isinstance(d, str)
        assert len(cell) == 4
        q, d, cell = make_pair(r, "scope")
        assert len(cell) == 3

    def test_batch_cells_distinct(self):
        r = np.random.default_rng(7)
        for _ in range(5):
            queries, docs = pair_batch(r, 32)
            assert len(queries) == 32 and len(docs) == 32
            assert len(set(docs)) == 32  # distinct cells => distinct docs

    def test_doc_scope_matches_query_tokens(self):
        # A quarter-mode doc must carry the quarter/year scope its query
        # names (the positive pair is scope-consistent by construction).
        r = np.random.default_rng(1)
        for _ in range(20):
            q, d, (bank, year, quarter, ctype) = make_pair(r, "quarter")
            assert f"Q{quarter}_FY{year}" in d
            assert bank.split()[0] in d

    def test_corpus_sample_deterministic(self):
        assert corpus_sample(10, seed=5) == corpus_sample(10, seed=5)

    def test_hard_block_invariants(self):
        from ragfin_tpu.models.pairgen import hard_block

        r = np.random.default_rng(3)
        for _ in range(30):
            rows = hard_block(r)
            assert len(rows) == 4
            cells = [c for _, _, c in rows]
            banks = {c[0] for c in cells}
            years = {c[1] for c in cells}
            assert len(banks) == 1 and len(years) == 1
            quarters = {c[2] for c in cells}
            ctypes = {c[3] for c in cells}
            # differ ONLY in quarter (types block: 1 quarter x 4 types is
            # the other kind) — exactly one of the two axes spans 4 values
            assert sorted((len(quarters), len(ctypes))) == [1, 4]
            assert len(set(cells)) == 4

    def test_hard_batch_distinct_cells(self):
        from ragfin_tpu.models.pairgen import pair_batch

        r = np.random.default_rng(11)
        queries, docs = pair_batch(
            r, 64, quarter_frac=0.0, nobank_frac=0.0, hard_frac=1.0
        )
        assert len(queries) == 64
        assert len(set(docs)) == 64

    def test_fragment_queries_cover_all_metrics_scopelessly(self):
        from ragfin_tpu.models.pairgen import _METRICS, fragment_queries

        frags = fragment_queries()
        assert len(frags) >= len(_METRICS)
        assert {ct for _, ct in frags} == set(_METRICS[m][0] for m in _METRICS)
        for q, _ in frags:
            # scope-token-less by construction: no digits, no FY/quarter
            assert not any(ch.isdigit() for ch in q), q
            assert "FY" not in q and "quarter" not in q.lower(), q
        assert fragment_queries() == frags  # deterministic

    def test_quarter_mode_emits_fragment_positives(self):
        # v5 prep: ~12% of quarter-mode queries are bare metric fragments
        # (no scope token => no digits; every templated quarter query
        # carries a period phrase, which always contains a year digit).
        r = np.random.default_rng(3)
        n_frag = 0
        for _ in range(400):
            q, d, cell = make_pair(r, "quarter")
            if not any(ch.isdigit() for ch in q):
                n_frag += 1
            assert len(cell) == 4  # cell semantics unchanged
        assert 20 <= n_frag <= 110

    def test_hard_quarters_blocks_never_fragment(self):
        # A scope-less fragment inside a QUARTERS block would have four
        # equally-valid same-metric docs (false negatives); only types
        # blocks may fragment.
        from ragfin_tpu.models.pairgen import hard_block

        r = np.random.default_rng(5)
        for _ in range(60):
            rows = hard_block(r)
            quarters = {c[2] for _, _, c in rows}
            if len(quarters) == 4:  # quarters block
                for q, _, _ in rows:
                    assert any(ch.isdigit() for ch in q), q


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    from ragfin_tpu.models.domain_encoder import train_domain_encoder

    d = str(tmp_path_factory.mktemp("ckpt"))
    result = train_domain_encoder(
        steps=8,
        batch_size=8,
        num_layers=2,
        vocab_budget=2048,
        query_len=32,
        doc_len=64,
        scan_chunk=4,
        warmup=2,
        ckpt_dir=d,
        log=lambda *a, **k: None,
    )
    return d, result


class TestTraining:
    def test_loss_decreases(self, tiny_checkpoint):
        _, result = tiny_checkpoint
        hist = result["history"]
        assert hist[-1]["loss_mean"] < hist[0]["loss_mean"]

    def test_checkpoint_roundtrip(self, tiny_checkpoint):
        from ragfin_tpu.models.domain_encoder import load_encoder_checkpoint

        d, _ = tiny_checkpoint
        params, tok, cfg, meta = load_encoder_checkpoint(d)
        assert cfg.num_layers == 2
        assert meta["steps"] == 8
        assert tok.collapse_numbers is True
        # f16 storage: loaded leaves are f32 again
        leaf = params["params"]["word_embeddings"]["embedding"]
        assert leaf.dtype == np.float32

    def test_trained_embedder(self, tiny_checkpoint):
        from ragfin_tpu.models.embedder import TrainedEmbedder, make_embedder

        d, _ = tiny_checkpoint
        emb = make_embedder("trained", checkpoint=d)
        assert isinstance(emb, TrainedEmbedder)
        v = emb.encode_texts(["ICICI net profit Q1 FY2024", "HDFC deposits"])
        assert v.shape == (2, 384)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
        # determinism
        v2 = emb.encode_texts(["ICICI net profit Q1 FY2024", "HDFC deposits"])
        np.testing.assert_allclose(v, v2, atol=0)

    def test_warm_start_finetune(self, tiny_checkpoint, tmp_path):
        """init_from fine-tunes in place of a from-scratch run: same vocab,
        same architecture, params initialized from the parent (v5 recipe)."""
        from ragfin_tpu.models.domain_encoder import (
            load_encoder_checkpoint,
            train_domain_encoder,
        )

        parent_dir, _ = tiny_checkpoint
        d = str(tmp_path / "finetuned")
        result = train_domain_encoder(
            steps=4,
            batch_size=8,
            scan_chunk=2,
            learning_rate=1e-4,
            warmup=1,
            ckpt_dir=d,
            init_from=parent_dir,
            log=lambda *a, **k: None,
        )
        assert result["steps"] == 4
        p_params, p_tok, p_cfg, _ = load_encoder_checkpoint(parent_dir)
        c_params, c_tok, c_cfg, c_meta = load_encoder_checkpoint(d)
        # drop-in compatible: identical vocabulary and architecture
        assert c_tok.vocab == p_tok.vocab
        assert (c_cfg.vocab_size, c_cfg.num_layers, c_cfg.hidden_size) == (
            p_cfg.vocab_size,
            p_cfg.num_layers,
            p_cfg.hidden_size,
        )
        assert c_meta["init_from"] == parent_dir
        # params moved but stayed close to the parent (fine-tune, not re-init)
        pe = p_params["params"]["word_embeddings"]["embedding"]
        ce = c_params["params"]["word_embeddings"]["embedding"]
        assert not np.array_equal(pe, ce)
        assert float(np.abs(pe - ce).max()) < 0.1

    def test_missing_checkpoint_raises(self, tmp_path):
        from ragfin_tpu.models.embedder import make_embedder

        with pytest.raises(Exception):
            make_embedder("trained", checkpoint=str(tmp_path / "nope"))

    def test_index_build_with_trained_backend(self, tiny_checkpoint):
        from ragfin_tpu.data.models import IndexedChunk
        from ragfin_tpu.index.vector_index import DeviceVectorIndex
        from ragfin_tpu.models.embedder import make_embedder

        d, _ = tiny_checkpoint
        chunks = [
            IndexedChunk(
                id=f"c{i}", text=t, period="Q1_FY2024", chunk_type="profitability_analysis",
                statement_type="consolidated", primary_value=1.0, company="ICICI Bank",
            )
            for i, t in enumerate(
                ["ICICI Bank net profit analysis", "HDFC Bank deposits analysis"]
            )
        ]
        idx = DeviceVectorIndex.build(chunks, embedder=make_embedder("trained", checkpoint=d))
        hits = idx.search_texts(["net profit"], top_k=2)
        assert len(hits[0]) == 2
        # featurizer-less backend: sparse rerank and expansion are no-ops
        assert idx.featurizer is None


class TestSettingsWiring:
    def test_validate_accepts_trained_with_checkpoint(self, tiny_checkpoint, monkeypatch):
        from ragfin_tpu.config.settings import Settings

        d, _ = tiny_checkpoint
        s = Settings(embed_backend="trained", trained_checkpoint=d)
        assert not [i for i in s.validate() if "trained" in i]

    def test_validate_flags_missing_checkpoint(self, tmp_path):
        from ragfin_tpu.config.settings import Settings

        s = Settings(embed_backend="trained", trained_checkpoint=str(tmp_path / "missing"))
        assert any("no checkpoint" in i for i in s.validate())

    def test_default_backend_tracks_packaged_checkpoint(self):
        from ragfin_tpu.config import settings as mod
        from ragfin_tpu.models.domain_encoder import DEFAULT_CKPT_DIR

        expected = (
            "trained"
            if os.path.exists(os.path.join(DEFAULT_CKPT_DIR, "config.json"))
            else "hashed"
        )
        assert mod._default_backend() == expected


class TestPackagedCheckpoint:
    """The checkpoint COMMITTED to the repo must load and retrieve sanely —
    a corrupt params.npz or vocab drift would otherwise only surface in the
    1M eval scripts, never in CI."""

    @pytest.fixture(scope="class")
    def packaged(self):
        from ragfin_tpu.models.domain_encoder import DEFAULT_CKPT_DIR

        if not os.path.exists(os.path.join(DEFAULT_CKPT_DIR, "config.json")):
            pytest.skip("no packaged checkpoint in this tree")
        from ragfin_tpu.models.embedder import TrainedEmbedder

        return TrainedEmbedder()

    def test_encodes_unit_norm(self, packaged):
        emb = packaged.encode_texts(
            ["ICICI Bank net profit Q1 FY2024", "customer deposits"]
        )
        assert emb.shape == (2, 384)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4)

    def test_retrieves_gold_on_real_corpus(self, packaged, reference_root):
        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        chunks = build_corpus(os.path.join(reference_root, "extract_data"))
        idx = DeviceVectorIndex.build(chunks, embedder=packaged)
        hits = idx.search_texts(
            ["What was ICICI Bank's net profit in Q1 FY2024?"], top_k=3
        )[0]
        assert "icici_q1_fy2024_profitability_analysis" in [h.id for h in hits]

    def test_save_load_keeps_trained_embedder(self, packaged, reference_root, tmp_path):
        """A persisted trained-backend index must reload with a WORKING
        embedder — trained is the default backend, so a deployment with
        RAGFIN_INDEX_DIR would otherwise reload embedder=None and raise on
        every post-restart query."""
        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        chunks = build_corpus(os.path.join(reference_root, "extract_data"))
        idx = DeviceVectorIndex.build(chunks, embedder=packaged)
        d = str(tmp_path / "idx")
        idx.save(d)
        loaded = DeviceVectorIndex.load(d)
        assert getattr(loaded, "embedder", None) is not None
        assert loaded.embedder.backend == "trained"
        q = "What was ICICI Bank's net profit in Q1 FY2024?"
        assert [h.id for h in loaded.search_texts([q], top_k=3)[0]] == [
            h.id for h in idx.search_texts([q], top_k=3)[0]
        ]


class TestEncoderRegressionGate:
    """Round-5 no-regression gate (VERDICT #1): the SHIPPED checkpoint must
    clear query-tower floors on BOTH the template-style qa_subset and the
    hand-written holdout phrasings. Floors sit at the shipped v4
    measurement (qa gold-wins 0.88, holdout 0.83, scripts/encoder_diag.py)
    minus noise slack; a v5+ candidate that regresses either set must not
    ship as the default checkpoint. (v3's floors were 0.78/0.45 — the BPE
    subword + augmentation retrain moved both, so the gate moved with it.)"""

    @pytest.fixture(scope="class")
    def diag(self, reference_root):
        from ragfin_tpu.models.domain_encoder import DEFAULT_CKPT_DIR

        if not os.path.exists(os.path.join(DEFAULT_CKPT_DIR, "config.json")):
            pytest.skip("no packaged checkpoint in this tree")
        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.eval.datasets import load_holdout_phrasings, load_qa_subset
        from ragfin_tpu.models.embedder import TrainedEmbedder

        embedder = TrainedEmbedder()
        chunks = build_corpus(os.path.join(reference_root, "extract_data"))
        docs = np.asarray(embedder.encode_texts([c.text for c in chunks]))
        ids = [c.id for c in chunks]

        def gold_wins(questions):
            q_emb = np.asarray(embedder.encode_texts([q.question for q in questions]))
            sims = q_emb @ docs.T
            wins = n = 0
            for qi, q in enumerate(questions):
                gold_idx = [i for i, cid in enumerate(ids) if cid in set(q.expected_chunks)]
                if not gold_idx:
                    continue
                n += 1
                row = sims[qi]
                best_gold = max(float(row[i]) for i in gold_idx)
                best_other = max(
                    float(row[i]) for i in range(len(ids)) if i not in gold_idx
                )
                wins += best_gold > best_other
            return wins / n

        qa = load_qa_subset(os.path.join(reference_root, "qa_subset.json"))
        return gold_wins(qa), gold_wins(load_holdout_phrasings())

    def test_qa_gold_wins_floor(self, diag):
        assert diag[0] >= 0.85, f"qa gold-wins regressed: {diag[0]:.3f} < 0.85"

    def test_holdout_gold_wins_floor(self, diag):
        assert diag[1] >= 0.78, f"holdout gold-wins regressed: {diag[1]:.3f} < 0.78"
