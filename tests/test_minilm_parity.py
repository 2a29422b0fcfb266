"""HF-loader numerical parity: prove load_hf_weights + MiniLMEncoder
reproduce the torch/transformers BERT forward (the architecture of
all-MiniLM-L6-v2) on a synthetic checkpoint.

This is the strongest validation possible in a zero-egress image (no
pretrained weights exist — VERDICT round 1 #4): if the Flax forward through
loaded weights matches ``transformers.BertModel`` + sentence-transformers
mean pooling to ~1e-4, the loader cannot be silently transposing kernels,
mis-mapping layernorms, or diverging on gelu/softmax — the day a real
checkpoint appears, only the file changes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


TINY = dict(
    vocab_size=101,
    hidden_size=48,
    num_layers=2,
    num_heads=4,
    intermediate_size=96,
    max_position=32,
)


@pytest.fixture(scope="module")
def bert_and_checkpoint(tmp_path_factory):
    """A randomly-initialized tiny BertModel + its saved state_dict."""
    cfg = transformers.BertConfig(
        vocab_size=TINY["vocab_size"],
        hidden_size=TINY["hidden_size"],
        num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        intermediate_size=TINY["intermediate_size"],
        max_position_embeddings=TINY["max_position"],
        hidden_act="gelu",
        layer_norm_eps=1e-12,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        # Large enough that every kernel materially shapes the output (the
        # default 0.02 makes attention scores ≈0 → uniform softmax → a broken
        # query/key kernel would be undetectable).
        initializer_range=0.2,
    )
    torch.manual_seed(7)
    model = transformers.BertModel(cfg, add_pooling_layer=False).eval()
    path = tmp_path_factory.mktemp("hf_ckpt")
    torch.save(model.state_dict(), path / "pytorch_model.bin")
    return model, str(path)


def _torch_sentence_embed(model, ids, mask):
    """sentence-transformers semantics: BERT → mean-pool → L2 normalize."""
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.zeros_like(torch.tensor(ids)),
        ).last_hidden_state
    m = torch.tensor(mask).unsqueeze(-1).float()
    pooled = (out * m).sum(1) / m.sum(1).clamp(min=1e-9)
    pooled = pooled / pooled.norm(dim=-1, keepdim=True).clamp(min=1e-12)
    return pooled.numpy()


class TestLoaderParity:
    def test_forward_matches_torch_bert(self, bert_and_checkpoint):
        import jax.numpy as jnp

        from ragfin_tpu.models.minilm import MiniLMConfig, MiniLMEncoder, load_hf_weights

        model, path = bert_and_checkpoint
        config = MiniLMConfig(dtype=jnp.float32, **TINY)
        params = load_hf_weights(path, config)

        rng = np.random.default_rng(0)
        ids = rng.integers(1, TINY["vocab_size"], (3, 12)).astype(np.int32)
        mask = np.ones((3, 12), np.int32)
        mask[1, 8:] = 0  # ragged batch exercises mask-aware pooling
        mask[2, 5:] = 0

        ours = np.asarray(
            MiniLMEncoder(config).apply(params, jnp.asarray(ids), jnp.asarray(mask))
        )
        theirs = _torch_sentence_embed(model, ids, mask)

        cos = np.sum(ours * theirs, axis=-1)  # both unit-norm
        assert cos.min() > 0.9999, f"cosine parity broken: {cos}"
        np.testing.assert_allclose(ours, theirs, atol=2e-4)

    def test_transposed_kernel_is_caught(self, bert_and_checkpoint):
        """Sanity: the parity check has teeth — transposing one attention
        kernel must break it."""
        import jax.numpy as jnp

        from ragfin_tpu.models.minilm import MiniLMConfig, MiniLMEncoder, load_hf_weights

        model, path = bert_and_checkpoint
        config = MiniLMConfig(dtype=jnp.float32, **TINY)
        params = load_hf_weights(path, config)
        broken = params["params"]["layer_0"]["attention"]["value"]["kernel"].T
        params["params"]["layer_0"]["attention"]["value"]["kernel"] = broken

        rng = np.random.default_rng(0)
        ids = rng.integers(1, TINY["vocab_size"], (3, 12)).astype(np.int32)
        mask = np.ones((3, 12), np.int32)
        ours = np.asarray(
            MiniLMEncoder(config).apply(params, jnp.asarray(ids), jnp.asarray(mask))
        )
        theirs = _torch_sentence_embed(model, ids, mask)
        cos = np.sum(ours * theirs, axis=-1)
        assert cos.min() < 0.9999  # parity must fail on a transposed kernel

    def test_bf16_production_dtype_close(self, bert_and_checkpoint):
        """The production bf16 activation path stays cosine>0.999 to the f32
        torch reference (SURVEY §7 gate, applied to the synthetic ckpt)."""
        import jax.numpy as jnp

        from ragfin_tpu.models.minilm import MiniLMConfig, MiniLMEncoder, load_hf_weights

        model, path = bert_and_checkpoint
        config = MiniLMConfig(dtype=jnp.bfloat16, **TINY)
        params = load_hf_weights(path, config)
        rng = np.random.default_rng(1)
        ids = rng.integers(1, TINY["vocab_size"], (4, 16)).astype(np.int32)
        mask = np.ones((4, 16), np.int32)
        ours = np.asarray(
            MiniLMEncoder(config).apply(params, jnp.asarray(ids), jnp.asarray(mask))
        )
        theirs = _torch_sentence_embed(model, ids, mask)
        cos = np.sum(ours * theirs, axis=-1)
        assert cos.min() > 0.999
