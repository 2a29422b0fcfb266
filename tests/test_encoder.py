"""Featurizer + bag encoder tests: determinism, parity with exact TF-IDF."""

import math

import numpy as np
import pytest

from ragfin_tpu.models.bag_encoder import BagEncoder, init_table, l2_normalize
from ragfin_tpu.models.featurizer import HashedFeaturizer, fnv1a64, tokenize


class TestTokenizer:
    def test_numbers_with_commas(self):
        assert tokenize("NET PROFIT: ₹10,636 crore") == ["net", "profit", "10636", "crore"]

    def test_decimals_kept(self):
        assert tokenize("growth (+44.0% YoY)") == ["growth", "44.0", "yoy"]

    def test_fnv_reference_vector(self):
        # Known FNV-1a 64 test vectors.
        assert fnv1a64(b"") == 0xCBF29CE484222325
        assert fnv1a64(b"a") == 0xAF63DC4C8601EC8C


class TestFeaturizer:
    def test_deterministic(self):
        f = HashedFeaturizer()
        a = f.feature_ids("net profit rose 44 percent")
        b = f.feature_ids("net profit rose 44 percent")
        assert a == b

    def test_oov_dropped_after_fit(self):
        f = HashedFeaturizer().fit(["net profit growth", "total assets"])
        weights = f.weigh(f.feature_ids("unseen zebra profit"))
        # "profit" survives; "unseen"/"zebra" (and their bigrams) are dropped.
        profit_id = fnv1a64(b"profit") % f.vocab_size
        assert profit_id in weights
        zebra_id = fnv1a64(b"zebra") % f.vocab_size
        assert zebra_id not in weights

    def test_state_roundtrip(self):
        f = HashedFeaturizer().fit(["alpha beta", "beta gamma"])
        g = HashedFeaturizer.from_state_dict(f.state_dict())
        assert g.idf == f.idf and g.n_docs == f.n_docs

    def test_encode_batch_shapes_and_padding(self):
        f = HashedFeaturizer()
        ids, wts = f.encode_batch(["one two three", "one"])
        assert ids.shape == wts.shape and ids.shape[1] % 128 == 0
        assert (wts[1] != 0).sum() == 1  # single unigram, no bigram


class TestBagEncoder:
    def test_unit_norm(self):
        enc = BagEncoder(vocab_size=512, dim=64)
        f = HashedFeaturizer(vocab_size=512)
        ids, wts = f.encode_batch(["net profit ten thousand"])
        emb = np.asarray(enc.encode(ids, wts))
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)

    def test_seed_determinism(self):
        a = np.asarray(init_table(256, 32, seed=7))
        b = np.asarray(init_table(256, 32, seed=7))
        c = np.asarray(init_table(256, 32, seed=8))
        assert np.array_equal(a, b) and not np.array_equal(a, c)

    def test_cosine_tracks_exact_tfidf(self):
        """JL projection: device cosine must approximate exact sparse TF-IDF
        cosine (SURVEY.md §7 embedding-parity requirement, applied to the
        weight-free encoder)."""
        docs = [
            "net profit 10636 crore growth 44 percent",
            "net profit 9648 crore growth 36 percent",
            "total assets 2039897 crore advances investments",
            "treasury segment revenue margin performance",
        ]
        f = HashedFeaturizer().fit(docs)
        enc = BagEncoder()

        def exact_vec(text):
            w = f.weigh(f.feature_ids(text))
            return w

        def exact_cos(a, b):
            wa, wb = exact_vec(a), exact_vec(b)
            dot = sum(v * wb.get(k, 0.0) for k, v in wa.items())
            na = math.sqrt(sum(v * v for v in wa.values()))
            nb = math.sqrt(sum(v * v for v in wb.values()))
            return dot / (na * nb) if na and nb else 0.0

        ids, wts = f.encode_batch(docs)
        emb = np.asarray(enc.encode(ids, wts))
        approx = emb @ emb.T
        for i in range(len(docs)):
            for j in range(len(docs)):
                assert abs(approx[i, j] - exact_cos(docs[i], docs[j])) < 0.15

    def test_padded_slots_ignored(self):
        enc = BagEncoder(vocab_size=512, dim=64)
        f = HashedFeaturizer(vocab_size=512)
        ids, wts = f.encode_batch(["alpha beta gamma"], pad_to=128)
        ids2, wts2 = f.encode_batch(["alpha beta gamma"], pad_to=256)
        a = np.asarray(enc.encode(ids, wts))
        b = np.asarray(enc.encode(ids2, wts2))
        np.testing.assert_allclose(a, b, atol=1e-6)
