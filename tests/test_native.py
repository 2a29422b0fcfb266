"""Native featurizer (C++ fasthash) parity tests against the Python path."""

import numpy as np
import pytest

from ragfin_tpu.models import fasthash
from ragfin_tpu.models.featurizer import HashedFeaturizer

pytestmark = pytest.mark.skipif(not fasthash.available(), reason="native lib not built")


@pytest.fixture(scope="module")
def corpus_texts(reference_root):
    import os

    from ragfin_tpu.data.loader import build_corpus

    return [c.text for c in build_corpus(os.path.join(reference_root, "extract_data"))]


class TestNativeParity:
    def test_feature_ids_match_python(self, corpus_texts):
        f = HashedFeaturizer()
        ids, tf, lens = fasthash.featurize_batch(corpus_texts, f.vocab_size, f.bigram_weight)
        for row, text in enumerate(corpus_texts):
            native = {int(i): float(v) for i, v in zip(ids[row, : lens[row]], tf[row, : lens[row]])}
            python = {int(k): float(v) for k, v in f.feature_ids(text).items()}
            assert native == python, f"mismatch on text {row}"

    def test_numbers_and_commas(self):
        f = HashedFeaturizer()
        texts = ["NET PROFIT: ₹10,636 crore (+44.0% YoY growth)", "1,234,567.89 and 5"]
        ids, tf, lens = fasthash.featurize_batch(texts, f.vocab_size, f.bigram_weight)
        for row, text in enumerate(texts):
            native = {int(i): float(v) for i, v in zip(ids[row, : lens[row]], tf[row, : lens[row]])}
            python = {int(k): float(v) for k, v in f.feature_ids(text).items()}
            assert native == python

    def test_encode_batch_embeddings_match(self, corpus_texts):
        """Index built through the native path must equal the Python path."""
        from ragfin_tpu.models.bag_encoder import BagEncoder

        f_native = HashedFeaturizer().fit(corpus_texts)
        ids_n, wts_n = f_native.encode_batch(corpus_texts)

        # Force the Python path by monkeypatching availability.
        f_py = HashedFeaturizer()
        f_py._native_batch = lambda texts: None
        f_py.fit(corpus_texts)
        ids_p, wts_p = f_py.encode_batch(corpus_texts)

        enc = BagEncoder()
        emb_n = np.asarray(enc.encode(ids_n, wts_n))
        emb_p = np.asarray(enc.encode(ids_p, wts_p))
        np.testing.assert_allclose(emb_n, emb_p, atol=1e-5)

    def test_empty_and_unicode(self):
        f = HashedFeaturizer()
        out = fasthash.featurize_batch(["", "αβγ δ", "plain ascii"], f.vocab_size, f.bigram_weight)
        ids, tf, lens = out
        assert lens[0] == 0
        python = {int(k): float(v) for k, v in f.feature_ids("plain ascii").items()}
        native = {int(i): float(v) for i, v in zip(ids[2, : lens[2]], tf[2, : lens[2]])}
        assert native == python


class TestCanonicalFeatureOrder:
    """encode_batch must present equal feature MULTISETS identically.

    Feature emission follows first-occurrence token order, which shifts with
    bytes that produce no features (dropped data-value numbers). Downstream
    f32 reductions (row norms, JL bag sums) are accumulation-order
    sensitive, so without canonical ordering two figure-perturbed
    near-duplicates drift apart by an ulp and the exact-tie lowest-row
    tie-break silently breaks (the 1M+20k residual zero-recall query)."""

    GOLD = (
        "ICICI Bank Limited Q1_FY2024 Key Financial Ratios & Metrics:\n\n"
        "EARNINGS METRICS:\n• Basic EPS: ₹15.22 per share (+43.3% YoY)\n"
        "• Diluted EPS: ₹14.91 per share\n\n"
    )

    def _pair(self):
        from ragfin_tpu.eval.distractors import _perturb_figures

        r = np.random.default_rng(7)
        return [self.GOLD, _perturb_figures(self.GOLD, r)]

    def test_native_rows_bitwise_identical(self):
        f = HashedFeaturizer()
        ids, wts = f.encode_batch(self._pair())
        assert np.array_equal(ids[0], ids[1])
        assert np.array_equal(wts[0], wts[1])
        # Rows are id-sorted over the non-zero-weight prefix.
        nz = wts[0] != 0
        assert np.all(np.diff(ids[0][nz]) >= 0)

    def test_python_fallback_rows_bitwise_identical(self):
        f = HashedFeaturizer()
        f._native_batch = lambda *a, **k: None  # force the Python path
        ids, wts = f.encode_batch(self._pair())
        assert np.array_equal(ids[0], ids[1])
        assert np.array_equal(wts[0], wts[1])

    def test_gold_wins_tie_against_figure_perturbed_dupes(self, reference_root):
        import os

        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.eval.distractors import generate_inscope_distractors
        from ragfin_tpu.index.vector_index import DeviceVectorIndex
        from ragfin_tpu.retrieval.queryfilter import FilteredSearch

        real = build_corpus(os.path.join(reference_root, "extract_data"))
        dupes = generate_inscope_distractors(real, 400, seed=11, tiers=("dupe",))
        idx = DeviceVectorIndex.build(list(real) + dupes)
        fs = FilteredSearch(idx, consistency_weight=0.95)
        hits = fs.search_texts(["What was the basic EPS in Q1 FY2024?"], top_k=10)[0]
        assert hits[0].record.id == "icici_q1_fy2024_key_ratios"


class TestIndexIO:
    def test_roundtrip_f32(self, tmp_path):
        from ragfin_tpu.utils import indexio

        arr = np.random.default_rng(0).standard_normal((384, 256)).astype(np.float32)
        path = str(tmp_path / "m.rgfi")
        indexio.write_array(path, arr)
        back = indexio.read_array(path)
        assert np.array_equal(back, arr)

    def test_roundtrip_int8(self, tmp_path):
        from ragfin_tpu.utils import indexio

        arr = np.random.default_rng(1).integers(-127, 127, (64, 100)).astype(np.int8)
        path = str(tmp_path / "q.rgfi")
        indexio.write_array(path, arr)
        assert np.array_equal(indexio.read_array(path), arr)

    def test_corruption_detected(self, tmp_path):
        from ragfin_tpu.utils import indexio

        arr = np.ones((8, 128), np.float32)
        path = str(tmp_path / "c.rgfi")
        indexio.write_array(path, arr)
        data = bytearray(open(path, "rb").read())
        data[100] ^= 0xFF  # flip a payload bit
        open(path, "wb").write(bytes(data))
        with pytest.raises(indexio.IndexIOError, match="checksum"):
            indexio.read_array(path)

    def test_index_save_load_uses_rgfi(self, tmp_path, reference_root):
        import os

        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        chunks = build_corpus(os.path.join(reference_root, "extract_data"))
        index = DeviceVectorIndex.build(chunks)
        d = str(tmp_path / "idx")
        index.save(d)
        assert os.path.exists(os.path.join(d, "matrix.rgfi"))
        loaded = DeviceVectorIndex.load(d)
        q = "net profit Q1 FY2024"
        assert [h.id for h in loaded.search_texts([q], top_k=3)[0]] == [
            h.id for h in index.search_texts([q], top_k=3)[0]
        ]
