"""Device-side bag-of-hashed-features encoder (weight-free lexical embedder).

The TPU half of the default embedding path (host half:
:mod:`ragfin_tpu.models.featurizer`). Each hashed feature id indexes a row of
a fixed seeded random table ``[V, D]``; a text's embedding is the L2-normalized
weighted sum of its feature rows. This is a Johnson-Lindenstrauss projection
of the sparse TF-IDF vector into D=384 dims, so device cosine similarity
approximates exact TF-IDF cosine — replacing the reference's
SentenceTransformer MiniLM encode (``chunking_storing (1).py:8``,
``retrieve.py:27``) when no pretrained weights are available.

The table is an ordinary JAX pytree parameter, so the same module is
trainable (contrastive fine-tuning of the projection) — see
``ragfin_tpu.models.training``.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..config.constants import EMBED_DIM


def init_table(
    vocab_size: int = 1 << 16,
    dim: int = EMBED_DIM,
    seed: int = 0,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Seeded random projection table, rows ~ N(0, 1/D)."""
    key = jax.random.PRNGKey(seed)
    return (jax.random.normal(key, (vocab_size, dim), jnp.float32) / math.sqrt(dim)).astype(dtype)


def bag_encode(
    table: jax.Array, ids: jax.Array, weights: jax.Array, normalize: bool = True
) -> jax.Array:
    """Encode a batch: (table [V,D], ids [B,L], weights [B,L]) → [B,D].

    Pure function of a pytree parameter — safe under jit/grad/shard_map.
    Padded slots carry weight 0 and contribute nothing.
    """
    rows = jnp.take(table, ids, axis=0)  # [B, L, D] gather from HBM
    emb = jnp.einsum("bld,bl->bd", rows, weights.astype(rows.dtype))
    emb = emb.astype(jnp.float32)
    if normalize:
        emb = l2_normalize(emb)
    return emb


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


_jit_bag_encode = jax.jit(functools.partial(bag_encode, normalize=True))


class BagEncoder:
    """Stateful convenience wrapper pairing the table with a jitted encode.

    All instances share one jitted encode (keyed by shapes), so constructing
    many encoders never retraces."""

    def __init__(
        self,
        vocab_size: int = 1 << 16,
        dim: int = EMBED_DIM,
        seed: int = 0,
        dtype: jnp.dtype = jnp.float32,
        table: Optional[jax.Array] = None,
    ):
        self.vocab_size = vocab_size
        self.dim = dim
        self.seed = seed
        # A caller-supplied table (e.g. a fine-tuned projection,
        # finetune.py) cannot be regenerated from the seed — persistence
        # must serialize it (see DeviceVectorIndex.save "encoder_table").
        self.tuned = table is not None
        self.table = table if table is not None else init_table(vocab_size, dim, seed, dtype)

    def encode(self, ids, weights) -> jax.Array:
        """ids [B,L] int32, weights [B,L] float32 → unit embeddings [B,D]."""
        return _jit_bag_encode(self.table, jnp.asarray(ids), jnp.asarray(weights))

    def state_dict(self) -> dict:
        return {
            "vocab_size": self.vocab_size,
            "dim": self.dim,
            "seed": self.seed,
            "tuned": self.tuned,
        }

    @classmethod
    def from_state_dict(cls, state: dict, table=None) -> "BagEncoder":
        if state.get("tuned") and table is None:
            raise ValueError(
                "encoder state says the projection table was tuned, but no "
                "table array was provided — reconstructing from the seed "
                "would silently mismatch the saved corpus matrix"
            )
        return cls(
            vocab_size=int(state["vocab_size"]),
            dim=int(state["dim"]),
            seed=int(state["seed"]),
            table=table,
        )
