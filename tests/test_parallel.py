"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragfin_tpu.ops.topk import cosine_topk_dense
from ragfin_tpu.parallel.mesh import factor_mesh_shape, make_mesh
from ragfin_tpu.parallel.sharded import ShardedVectorIndex, sharded_cosine_topk


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(("data",))


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestShardedTopk:
    def test_matches_single_device(self, mesh):
        rng = np.random.default_rng(3)
        n, d, q, k = 1024, 64, 7, 9
        corpus = _unit(rng, n, d)
        queries = _unit(rng, q, d)
        from jax.sharding import NamedSharding, PartitionSpec as P

        ct = jax.device_put(jnp.asarray(corpus.T), NamedSharding(mesh, P(None, "data")))
        s_sh, i_sh = sharded_cosine_topk(mesh, "data", jnp.asarray(queries), ct, k, n_valid=n)
        s_ref, i_ref = cosine_topk_dense(jnp.asarray(queries), jnp.asarray(corpus.T.copy()), k)
        assert np.array_equal(np.asarray(i_sh), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref), rtol=1e-5)

    def test_padding_masked(self, mesh):
        rng = np.random.default_rng(4)
        n, d = 100, 32  # not divisible by 8 → padded shards
        corpus = _unit(rng, n, d)
        queries = corpus[:3]
        from jax.sharding import NamedSharding, PartitionSpec as P

        pad = -n % (8 * 16)
        ct = np.pad(corpus.T, ((0, 0), (0, pad)))
        ct = jax.device_put(jnp.asarray(ct), NamedSharding(mesh, P(None, "data")))
        s, i = sharded_cosine_topk(mesh, "data", jnp.asarray(queries), ct, 5, n_valid=n)
        assert int(np.max(np.asarray(i))) < n
        assert list(np.asarray(i)[:, 0]) == [0, 1, 2]  # self-retrieval

    @pytest.mark.parametrize("method", ["dense", "blocked", "fused"])
    def test_pads_never_displace_negative_scores(self, mesh, method):
        """Regression (advisor round 1): zero-pad columns score 0.0 and used
        to win the per-shard local top-k over valid negative-cosine
        candidates. All-negative-similarity corpus + ~98% padding must still
        return the true (negative-score) top-k, matching the oracle."""
        rng = np.random.default_rng(7)
        n, d, k = 100, 32, 5
        base = _unit(rng, 1, d)[0]
        # Corpus points all lie in the half-space opposite the query.
        corpus = _unit(rng, n, d)
        corpus = corpus - 2 * np.maximum(corpus @ base, 0)[:, None] * base
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        queries = base[None, :]
        from jax.sharding import NamedSharding, PartitionSpec as P

        pad = -n % (8 * 128)  # default pad_multiple → ~98% pad columns
        ct_np = np.pad(corpus.T, ((0, 0), (0, pad)))
        ct = jax.device_put(jnp.asarray(ct_np), NamedSharding(mesh, P(None, "data")))
        s, i = sharded_cosine_topk(
            mesh, "data", jnp.asarray(queries), ct, k, n_valid=n, method=method
        )
        s_ref, i_ref = cosine_topk_dense(jnp.asarray(queries), jnp.asarray(corpus.T.copy()), k)
        assert np.array_equal(np.asarray(i), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-5)
        assert float(np.max(np.asarray(s))) < 0.0  # genuinely negative scores

    def test_pads_never_displace_negative_scores_int8(self, mesh):
        from ragfin_tpu.ops.quantize import quantize_corpus_t

        rng = np.random.default_rng(8)
        n, d, k = 96, 32, 5
        base = _unit(rng, 1, d)[0]
        corpus = _unit(rng, n, d)
        corpus = corpus - 2 * np.maximum(corpus @ base, 0)[:, None] * base
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        queries = base[None, :]
        from jax.sharding import NamedSharding, PartitionSpec as P

        pad = -n % (8 * 128)
        ct_np = np.pad(corpus.T, ((0, 0), (0, pad))).astype(np.float32)
        c8, sc = quantize_corpus_t(jnp.asarray(ct_np))
        sharding = NamedSharding(mesh, P(None, "data"))
        c8 = jax.device_put(c8, sharding)
        sc = jax.device_put(sc, sharding)
        s, i = sharded_cosine_topk(
            mesh, "data", jnp.asarray(queries), c8, k, n_valid=n, method="int8", scales=sc
        )
        s_ref, i_ref = cosine_topk_dense(jnp.asarray(queries), jnp.asarray(corpus.T.copy()), k)
        assert np.array_equal(np.asarray(i), np.asarray(i_ref))
        assert float(np.max(np.asarray(s))) < 0.0


class TestShardedIndex:
    def test_from_dense_same_results(self, mesh, reference_root):
        import os

        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        chunks = build_corpus(os.path.join(reference_root, "extract_data"))
        dense = DeviceVectorIndex.build(chunks)
        sharded = ShardedVectorIndex.from_dense(dense, mesh=mesh)
        q = "What was ICICI Bank's net profit in Q1 FY2024?"
        a = [h.id for h in dense.search_texts([q], top_k=5)[0]]
        b = [h.id for h in sharded.search_texts([q], top_k=5)[0]]
        assert a == b

    def test_mesh_factoring(self):
        assert factor_mesh_shape(8) == (4, 2)
        assert factor_mesh_shape(4) == (2, 2)
        assert factor_mesh_shape(6) == (3, 2)
        assert factor_mesh_shape(1) == (1, 1)
        assert factor_mesh_shape(7) == (7, 1)


class TestTraining:
    def test_bag_encoder_contrastive_step_improves(self):
        import optax

        from ragfin_tpu.models.bag_encoder import init_table
        from ragfin_tpu.models.training import bag_apply, init_train_state, make_train_step

        rng = np.random.default_rng(0)
        table = init_table(vocab_size=512, dim=32, seed=1)
        opt = optax.adam(1e-2)
        step = jax.jit(make_train_step(bag_apply, opt))
        state = init_train_state(table, opt)
        ids = rng.integers(0, 512, (16, 8)).astype(np.int32)
        wts = np.ones((16, 8), np.float32)
        batch = {
            "query": {"ids": jnp.asarray(ids), "weights": jnp.asarray(wts)},
            "doc": {"ids": jnp.asarray(ids), "weights": jnp.asarray(wts)},
        }
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert float(metrics["accuracy"]) > 0.5

    def test_minilm_forward_and_step(self):
        import optax

        from ragfin_tpu.models.minilm import MiniLMConfig, init_params, minilm_apply
        from ragfin_tpu.models.training import init_train_state, make_train_step

        config = MiniLMConfig(num_layers=1, hidden_size=64, num_heads=4,
                              intermediate_size=128, vocab_size=1000, dtype=jnp.float32)
        params = init_params(config, seq_len=8)
        rng = np.random.default_rng(1)
        side = {
            "input_ids": jnp.asarray(rng.integers(0, 1000, (4, 8)), jnp.int32),
            "attention_mask": jnp.ones((4, 8), jnp.int32),
        }
        emb = minilm_apply(params, side, config)
        assert emb.shape == (4, 64)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-5)

        opt = optax.adamw(1e-3)
        step = jax.jit(make_train_step(lambda p, s: minilm_apply(p, s, config), opt))
        state = init_train_state(params, opt)
        state, metrics = step(state, {"query": side, "doc": side})
        assert np.isfinite(float(metrics["loss"]))


class TestTokenizer:
    def test_wordpiece_with_vocab(self):
        from ragfin_tpu.models.tokenizer import WordPieceTokenizer

        vocab = {t: i for i, t in enumerate(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "net", "profit", "bank", "##ing", "10", "##63", "##6"]
        )}
        tok = WordPieceTokenizer(vocab=vocab)
        ids = tok.encode("net profit banking")
        assert ids[0] == vocab["[CLS]"] and ids[-1] == vocab["[SEP]"]
        assert vocab["bank"] in ids and vocab["##ing"] in ids

    def test_hash_fallback_deterministic(self):
        from ragfin_tpu.models.tokenizer import WordPieceTokenizer

        tok = WordPieceTokenizer()
        a, mask_a = tok.encode_batch(["net profit", "net profit"])
        assert np.array_equal(a[0], a[1])
        assert mask_a.sum(axis=1)[0] == mask_a.sum(axis=1)[1]

    def test_batch_padding(self):
        from ragfin_tpu.models.tokenizer import WordPieceTokenizer

        tok = WordPieceTokenizer()
        ids, mask = tok.encode_batch(["one", "a much longer sentence with many words"], pad_multiple=16)
        assert ids.shape == mask.shape and ids.shape[1] % 16 == 0


class TestProfiling:
    def test_stage_timer(self):
        from ragfin_tpu.utils.profiling import StageTimer

        t = StageTimer()
        with t.stage("a"):
            with t.stage("b"):
                pass
        s = t.summary()
        assert "a" in s and "a/b" in s

    def test_metric_registry(self):
        from ragfin_tpu.utils.profiling import MetricRegistry

        m = MetricRegistry()
        with m.timed("search"):
            pass
        m.incr("queries", 5)
        s = m.summary()
        assert s["counters"]["queries"] == 5
        assert s["latency_ms"]["search"]["count"] == 1
        assert m.qps("search") > 0


class TestShardedInt8:
    def test_int8_matches_dense_on_real_corpus(self, mesh, reference_root):
        import os

        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.index.vector_index import DeviceVectorIndex
        from ragfin_tpu.ops.quantize import quantize_corpus_t
        from ragfin_tpu.parallel.sharded import sharded_cosine_topk

        chunks = build_corpus(os.path.join(reference_root, "extract_data"))
        dense = DeviceVectorIndex.build(chunks, pad_multiple=128)
        ct = dense.matrix_t  # [D, 128]
        c8, sc = quantize_corpus_t(ct)
        sharding = NamedSharding(mesh, P(None, "data"))
        c8 = jax.device_put(c8, sharding)
        sc = jax.device_put(sc, sharding)

        ids, wts = dense.featurizer.encode_batch(["What was ICICI Bank's net profit in Q1 FY2024?"])
        q = dense.encoder.encode(ids, wts)
        s, i = sharded_cosine_topk(mesh, "data", q, c8, 3, n_valid=dense.n, method="int8", scales=sc)
        top = dense.records[int(np.asarray(i)[0, 0])]
        assert top.id == "icici_q1_fy2024_profitability_analysis"

    def test_int8_requires_scales(self, mesh):
        import jax.numpy as jnp

        from ragfin_tpu.parallel.sharded import sharded_cosine_topk

        with pytest.raises(ValueError, match="scales"):
            sharded_cosine_topk(
                mesh, "data", jnp.zeros((1, 8)), jnp.zeros((8, 64), jnp.int8), 3,
                n_valid=64, method="int8",
            )


class TestDistributedHelpers:
    def test_single_process_noop(self):
        from ragfin_tpu.parallel.distributed import global_corpus_mesh, initialize_distributed

        info = initialize_distributed(num_processes=1, process_id=0)
        assert info["num_processes"] == 1
        assert info["global_devices"] >= 8
        mesh = global_corpus_mesh()
        assert mesh.axis_names == ("data",)
        assert mesh.size == jax.device_count()


class TestPipelineParallel:
    def test_pipeline_matches_sequential(self):
        from jax.sharding import Mesh

        from ragfin_tpu.parallel.mesh import make_mesh
        from ragfin_tpu.parallel.pipeline import (
            init_pipeline_params,
            make_pipeline_forward,
            place_pipeline_params,
            sequential_forward,
        )

        mesh = make_mesh(("pp",), (4,), devices=jax.devices()[:4])
        L, d, M, B = 8, 16, 3, 4  # 2 layers per stage
        params = init_pipeline_params(jax.random.PRNGKey(0), L, d)
        x = jax.random.normal(jax.random.PRNGKey(1), (M, B, d))

        pipe = make_pipeline_forward(mesh)
        out = pipe(place_pipeline_params(params, mesh), x)
        ref = jax.vmap(lambda mb: sequential_forward(params, mb))(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_pipeline_training_reduces_loss(self):
        from ragfin_tpu.parallel.mesh import make_mesh
        from ragfin_tpu.parallel.pipeline import (
            init_pipeline_params,
            make_pipeline_train_step,
            place_pipeline_params,
        )

        mesh = make_mesh(("pp",), (2,), devices=jax.devices()[:2])
        params = init_pipeline_params(jax.random.PRNGKey(0), 4, 8)
        params = place_pipeline_params(params, mesh)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
        targets = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8)) * 0.1
        step = make_pipeline_train_step(mesh, learning_rate=0.05)
        losses = []
        for _ in range(8):
            params, loss = step(params, x, targets)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
