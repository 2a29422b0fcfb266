"""Flax MiniLM-class sentence encoder (the reference's embedding model, T1).

A from-scratch JAX/Flax implementation of the ``all-MiniLM-L6-v2``
architecture the reference uses for every embedding
(``chunking_storing (1).py:8``, ``retrieve.py:14``): 6 transformer layers,
hidden 384, 12 heads, intermediate 1536, mean pooling over the attention
mask, L2 normalization. Runs in bf16 on the MXU with f32 layernorm/softmax
accumulation.

Pretrained HF weights load via :func:`load_hf_weights` when a checkpoint
directory is available (zero-egress images fall back to seeded random init —
retrieval quality then comes from the hashed lexical encoder instead, see
``ragfin_tpu.models.bag_encoder``; the transformer remains the trainable
flagship for the contrastive fine-tuning path).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.constants import EMBED_DIM


@dataclasses.dataclass(frozen=True)
class MiniLMConfig:
    vocab_size: int = 30522
    hidden_size: int = EMBED_DIM  # 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pooling: str = "mean"  # "mean" (sentence-transformers) | "cls" (BGE-style)
    dtype: Any = jnp.bfloat16  # activation dtype (params stay f32)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


# Encoder family presets: the reference's embedder is MINILM_L6
# (all-MiniLM-L6-v2, chunking_storing (1).py:8); the others are the common
# sentence-encoder variants a reference user might swap in.
MINILM_L6 = MiniLMConfig()
MINILM_L12 = MiniLMConfig(num_layers=12)
BGE_SMALL = MiniLMConfig(num_layers=12, pooling="cls")
BERT_BASE = MiniLMConfig(hidden_size=768, num_layers=12, intermediate_size=3072, pooling="cls")

ENCODER_PRESETS = {
    "minilm-l6": MINILM_L6,
    "minilm-l12": MINILM_L12,
    "bge-small": BGE_SMALL,
    "bert-base": BERT_BASE,
}


class SelfAttention(nn.Module):
    config: MiniLMConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name=name)
        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)

        def split(t):  # [B, S, H] -> [B, heads, S, head_dim]
            b, s, _ = t.shape
            return t.reshape(b, s, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(cfg.head_dim)
        scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, h, s, d = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output")(ctx)


class TransformerLayer(nn.Module):
    config: MiniLMConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        attn = SelfAttention(cfg, name="attention")(x, mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="attention_norm")(
            x + attn
        ).astype(cfg.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="ffn_output")(h)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ffn_norm")(
            x + h
        ).astype(cfg.dtype)
        return x


class MiniLMEncoder(nn.Module):
    """Token ids → unit sentence embedding (mean-pooled, L2-normalized)."""

    config: MiniLMConfig = MiniLMConfig()

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        cfg = self.config
        mask = attention_mask.astype(bool)
        pos = jnp.arange(input_ids.shape[1])[None, :]
        x = (
            nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype, name="word_embeddings")(input_ids)
            + nn.Embed(cfg.max_position, cfg.hidden_size, dtype=cfg.dtype, name="position_embeddings")(pos)
            + nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=cfg.dtype, name="token_type_embeddings")(
                jnp.zeros_like(input_ids)
            )
        )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="embeddings_norm")(x).astype(
            cfg.dtype
        )
        for i in range(cfg.num_layers):
            x = TransformerLayer(cfg, name=f"layer_{i}")(x, mask)
        if cfg.pooling == "cls":
            pooled = x[:, 0, :].astype(jnp.float32)
        else:
            # Mean pooling over real tokens (sentence-transformers mode).
            weights = mask.astype(jnp.float32)[:, :, None]
            pooled = jnp.sum(x.astype(jnp.float32) * weights, axis=1) / jnp.maximum(
                jnp.sum(weights, axis=1), 1e-9
            )
        return pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


def init_params(config: MiniLMConfig = MiniLMConfig(), seed: int = 0, seq_len: int = 16):
    model = MiniLMEncoder(config)
    ids = jnp.zeros((1, seq_len), jnp.int32)
    mask = jnp.ones((1, seq_len), jnp.int32)
    return model.init(jax.random.PRNGKey(seed), ids, mask)


def minilm_apply(params, side: dict, config: MiniLMConfig = MiniLMConfig()) -> jax.Array:
    """Encoder-apply adapter for ragfin_tpu.models.training."""
    return MiniLMEncoder(config).apply(params, side["input_ids"], side["attention_mask"])


# ---------------------------------------------------------------------------
# HF checkpoint import (optional; zero-egress images have no checkpoint)
# ---------------------------------------------------------------------------

_HF_LAYER_MAP = {
    "attention.self.query": ("attention", "query"),
    "attention.self.key": ("attention", "key"),
    "attention.self.value": ("attention", "value"),
    "attention.output.dense": ("attention", "output"),
    "intermediate.dense": ("intermediate",),
    "output.dense": ("ffn_output",),
}
_HF_LAYER_NORMS = {
    "attention.output.LayerNorm": "attention_norm",
    "output.LayerNorm": "ffn_norm",
}


def load_hf_weights(path: str, config: MiniLMConfig = MiniLMConfig()):
    """Load a HF BERT/MiniLM checkpoint directory into Flax param pytree.

    Supports ``model.safetensors`` or ``pytorch_model.bin``. Returns params in
    the layout of :class:`MiniLMEncoder`.
    """
    import os

    tensors: dict[str, np.ndarray] = {}
    st_path = os.path.join(path, "model.safetensors")
    pt_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        tensors = load_file(st_path)
    elif os.path.exists(pt_path):
        import torch

        state = torch.load(pt_path, map_location="cpu", weights_only=True)
        tensors = {k: v.numpy() for k, v in state.items()}
    else:
        raise FileNotFoundError(f"no checkpoint under {path}")

    def t(name):
        for prefix in ("", "bert.", "encoder."):
            if prefix + name in tensors:
                return np.asarray(tensors[prefix + name])
        raise KeyError(name)

    params: dict[str, Any] = {
        "word_embeddings": {"embedding": t("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": t("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": t("embeddings.token_type_embeddings.weight")},
        "embeddings_norm": {
            "scale": t("embeddings.LayerNorm.weight"),
            "bias": t("embeddings.LayerNorm.bias"),
        },
    }
    for i in range(config.num_layers):
        layer: dict[str, Any] = {}
        hf = f"encoder.layer.{i}."
        for hf_key, ours in _HF_LAYER_MAP.items():
            kernel = t(hf + hf_key + ".weight").T  # torch Linear stores [out, in]
            bias = t(hf + hf_key + ".bias")
            node = layer
            for part in ours[:-1]:
                node = node.setdefault(part, {})
            node[ours[-1]] = {"kernel": kernel, "bias": bias}
        for hf_key, ours in _HF_LAYER_NORMS.items():
            layer[ours] = {"scale": t(hf + hf_key + ".weight"), "bias": t(hf + hf_key + ".bias")}
        params[f"layer_{i}"] = layer
    return {"params": params}
