"""Unified embedder interface: text batch → unit embeddings [B, 384].

Two interchangeable backends behind one protocol (selected by
``Settings.embed_backend``):

- :class:`HashedEmbedder` — the weight-free lexical default
  (featurizer → bag encoder; exact TF-IDF-cosine approximation).
- :class:`MiniLMEmbedder` — the MiniLM-class Flax transformer
  (reference embedding model, ``chunking_storing (1).py:8``), WordPiece
  tokenization, jitted batched forward; loads a HF checkpoint directory when
  available, seeded-random init otherwise.

SURVEY.md §7 embedding-parity note: when a real checkpoint is present,
validate MiniLMEmbedder against sentence-transformers outputs
(cosine > 0.999) before claiming recall parity through this backend.
"""

from __future__ import annotations

from typing import Optional, Protocol, Sequence

import numpy as np

from ..config.constants import EMBED_DIM


class Embedder(Protocol):
    dim: int

    def fit(self, texts: Sequence[str]) -> "Embedder": ...

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray: ...

    def state_dict(self) -> dict: ...


class HashedEmbedder:
    """Featurizer + bag-encoder pipeline as one object."""

    backend = "hashed"

    def __init__(self, vocab_size: int = 1 << 16, dim: int = EMBED_DIM, seed: int = 0,
                 featurizer=None, encoder=None):
        from .bag_encoder import BagEncoder
        from .featurizer import HashedFeaturizer

        self.featurizer = featurizer or HashedFeaturizer(vocab_size=vocab_size)
        self.encoder = encoder or BagEncoder(vocab_size=vocab_size, dim=dim, seed=seed)
        self.dim = dim

    def fit(self, texts: Sequence[str]) -> "HashedEmbedder":
        self.featurizer.fit(texts)
        return self

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        ids, wts = self.featurizer.encode_batch(list(texts))
        return np.asarray(self.encoder.encode(ids, wts))

    def state_dict(self) -> dict:
        return {
            "backend": self.backend,
            "featurizer": self.featurizer.state_dict(),
            "encoder": self.encoder.state_dict(),
        }

    @classmethod
    def from_state_dict(cls, state: dict, encoder_table=None) -> "HashedEmbedder":
        from .bag_encoder import BagEncoder
        from .featurizer import HashedFeaturizer

        return cls(
            featurizer=HashedFeaturizer.from_state_dict(state["featurizer"]),
            encoder=BagEncoder.from_state_dict(state["encoder"], table=encoder_table),
        )


class MiniLMEmbedder:
    """Flax MiniLM forward as an embedder (batched, jitted, bf16 MXU)."""

    backend = "minilm"

    def __init__(self, checkpoint: Optional[str] = None, seed: int = 0, batch_size: int = 64,
                 max_len: int = 256):
        import jax

        from .minilm import MiniLMConfig, MiniLMEncoder, init_params, load_hf_weights
        from .tokenizer import WordPieceTokenizer

        self.config = MiniLMConfig()
        self.dim = self.config.hidden_size
        self.batch_size = batch_size
        self.checkpoint = checkpoint
        tokenizer = None
        params = None
        if checkpoint:
            try:
                params = load_hf_weights(checkpoint, self.config)
                tokenizer = WordPieceTokenizer.find_checkpoint_vocab(checkpoint, max_len=max_len)
            except Exception:
                # ANY load failure (missing file, truncated safetensors,
                # absent torch/safetensors dep) falls back to random init —
                # the documented contract; a partial load must not crash
                # engine startup.
                params = None
                tokenizer = None
            if params is not None and tokenizer is None:
                # Pretrained weights with no checkpoint vocab would pair
                # the real embedding matrix with hash-bucket token ids —
                # garbage embeddings confidently labeled pretrained.
                params = None
        # HF weights load as host numpy; pin them device-resident so encode
        # batches don't re-upload the parameter tree per dispatch (same
        # fix as TrainedEmbedder — measured 13× on the tunnel).
        self.params = jax.device_put(
            params if params is not None else init_params(self.config, seed=seed)
        )
        self.pretrained = params is not None
        self.tokenizer = tokenizer or WordPieceTokenizer(max_len=max_len)
        self._apply = _jit_minilm_apply(self.config)

    def fit(self, texts: Sequence[str]) -> "MiniLMEmbedder":
        return self  # nothing corpus-dependent

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        out = []
        for start in range(0, len(texts), self.batch_size):
            batch = list(texts[start : start + self.batch_size])
            ids, mask = self.tokenizer.encode_batch(batch)
            out.append(np.asarray(self._apply(self.params, ids, mask)))
        return np.concatenate(out, axis=0) if out else np.zeros((0, self.dim), np.float32)

    def state_dict(self) -> dict:
        return {"backend": self.backend, "checkpoint": self.checkpoint, "pretrained": self.pretrained}


class TrainedEmbedder:
    """The from-scratch in-domain semantic encoder (models/domain_encoder.py).

    Replaces the reference's pretrained SentenceTransformer
    (``chunking_storing (1).py:8``) with weights TRAINED in this repo —
    the only semantic path possible in a zero-egress image. Loads the
    committed checkpoint (params + domain WordPiece vocab + architecture),
    shares the jitted MiniLM forward across instances, encodes in bf16 on
    the MXU. Raises on a missing/corrupt checkpoint: unlike MiniLMEmbedder's
    documented random-init fallback, silently serving untrained weights
    under the name "trained" would be a quality lie.
    """

    backend = "trained"

    def __init__(
        self,
        checkpoint: Optional[str] = None,
        batch_size: int = 256,
        pad_multiple: int = 16,
    ):
        from .domain_encoder import DEFAULT_CKPT_DIR, load_encoder_checkpoint

        self.checkpoint = checkpoint or DEFAULT_CKPT_DIR
        self.params, self.tokenizer, self.config, self.meta = load_encoder_checkpoint(
            self.checkpoint
        )
        # Checkpoint params load as HOST numpy arrays; without an explicit
        # device_put every encode batch re-uploads the full ~30MB parameter
        # tree through the tunnel (measured 1.5 s/batch vs 0.11 s resident —
        # 110 vs 2,700 chunks/s on the 20k corpus encode).
        import jax

        self.params = jax.device_put(self.params)
        self.dim = self.config.hidden_size
        self.batch_size = batch_size
        # Bulk corpus encodes set pad_multiple = max_position so every batch
        # compiles to ONE [B, S] shape (remote compile is the expensive
        # resource); interactive queries keep the default 16 for short-seq
        # speed.
        self.pad_multiple = pad_multiple
        self._apply = _jit_minilm_apply(self.config)

    def fit(self, texts: Sequence[str]) -> "TrainedEmbedder":
        return self  # nothing corpus-dependent at index-build time

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        out = []
        for start in range(0, len(texts), self.batch_size):
            batch = list(texts[start : start + self.batch_size])
            ids, mask = self.tokenizer.encode_batch(batch, pad_multiple=self.pad_multiple)
            # Bucket the ROW dimension: every distinct row count is a fresh
            # remote compile of the full encoder forward, and the serving
            # batcher forms arbitrary query-batch sizes — the same compile
            # storm the top-k path pads away (vector_index._q_bucket). Tail
            # batches of a bulk encode pad to the full batch shape;
            # interactive batches pad to the {1, 8, 64, k*64} buckets.
            rows = len(batch)
            if rows < self.batch_size:
                if len(texts) > self.batch_size:
                    target = self.batch_size
                elif rows <= 1:
                    target = 1
                elif rows <= 8:
                    target = 8
                else:
                    target = min(self.batch_size, -(-rows // 64) * 64)
                # Interactive calls also pin the SEQUENCE dim to 64-token
                # buckets: with the default pad_multiple=16 a novel query
                # length would compile a fresh forward mid-serving (same
                # storm class as the row dimension, other axis).
                s_pad = max(64, -(-ids.shape[1] // 64) * 64) - ids.shape[1]
                if s_pad:
                    ids = np.pad(ids, ((0, 0), (0, s_pad)))
                    mask = np.pad(mask, ((0, 0), (0, s_pad)))
                if target > rows:
                    ids = np.pad(ids, ((0, target - rows), (0, 0)))
                    mask = np.pad(mask, ((0, target - rows), (0, 0)))
            emb = np.asarray(self._apply(self.params, ids, mask), np.float32)[:rows]
            out.append(emb)
        return np.concatenate(out, axis=0) if out else np.zeros((0, self.dim), np.float32)

    def state_dict(self) -> dict:
        return {"backend": self.backend, "checkpoint": self.checkpoint, "meta": self.meta}


import functools


@functools.lru_cache(maxsize=8)
def _jit_minilm_apply(config):
    """One jitted forward per MiniLM config, shared across instances.

    A per-instance jax.jit closure retraces/recompiles the full 6-layer
    encoder for every MiniLMEmbedder construction (engine restart + eval
    harness = two compiles per sequence-length bucket — minutes through a
    degraded remote-compile window). Mirrors bag_encoder's module-level
    _jit_bag_encode. Requires config to be hashable (it is a frozen
    dataclass)."""
    import jax

    from .minilm import MiniLMEncoder

    model = MiniLMEncoder(config)
    return jax.jit(lambda p, ids, mask: model.apply(p, ids, mask))


def make_embedder(backend: str = "hashed", **kwargs) -> Embedder:
    known = {
        "hashed": ("vocab_size", "dim", "seed", "featurizer", "encoder"),
        "minilm": ("checkpoint", "seed", "batch_size", "max_len"),
        "trained": ("checkpoint", "batch_size", "pad_multiple"),
    }
    if backend not in known:
        raise ValueError(f"unknown embed backend: {backend}")
    all_known = set().union(*known.values())
    unknown = set(kwargs) - all_known
    if unknown:
        raise TypeError(f"unknown embedder kwargs: {sorted(unknown)}")
    cls = {"hashed": HashedEmbedder, "minilm": MiniLMEmbedder, "trained": TrainedEmbedder}[backend]
    return cls(**{k: v for k, v in kwargs.items() if k in known[backend]})
