"""From-scratch in-domain semantic encoder: training, checkpoint IO (T1/C4).

The reference embeds everything with a pretrained
``SentenceTransformer('all-MiniLM-L6-v2')`` (``chunking_storing (1).py:8``).
No pretrained weights can exist in this zero-egress image, so the semantic
encoder is TRAINED FROM SCRATCH on the TPU instead: a MiniLM-architecture
Flax transformer (:mod:`ragfin_tpu.models.minilm`, sized to the domain) with
a domain-learned WordPiece vocabulary, optimized with symmetric InfoNCE over
unlimited synthetic (query, document) pairs
(:mod:`ragfin_tpu.models.pairgen`).

TPU-first training design:

- one jitted program runs ``scan_chunk`` optimizer steps via ``lax.scan``
  (static shapes, no per-step dispatch) — through the remote-compile tunnel
  this amortizes dispatch overhead to ~1 call per tens of steps;
- batches are stacked on host to ``[K, B, S]`` int32 arrays and passed as
  ARGUMENTS (never closed over — CLAUDE.md baked-constant lesson);
- activations run bf16 on the MXU, params/optimizer state stay f32.

Checkpoint format (``checkpoints/domain_encoder/``, committed to the repo):
``config.json`` (architecture + tokenizer flags + training metadata),
``vocab.txt`` (WordPiece vocabulary), ``params.npz`` (f16 leaves keyed by
pytree path). Loaded by :class:`ragfin_tpu.models.embedder.TrainedEmbedder`.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_CKPT_DIR = os.environ.get(
    "RAGFIN_TRAINED_CHECKPOINT", os.path.join(_REPO_ROOT, "checkpoints", "domain_encoder")
)


# ---------------------------------------------------------------------------
# Checkpoint IO
# ---------------------------------------------------------------------------


def _flatten_params(params: Any) -> dict[str, np.ndarray]:
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_params(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(value, np.float32)
    return tree


def save_encoder_checkpoint(
    directory: str, params: Any, vocab: dict[str, int], config, meta: Optional[dict] = None
) -> str:
    from .tokenizer import WordPieceTokenizer

    os.makedirs(directory, exist_ok=True)
    flat = _flatten_params(params)
    np.savez_compressed(
        os.path.join(directory, "params.npz"),
        **{k: v.astype(np.float16) for k, v in flat.items()},
    )
    WordPieceTokenizer(vocab=vocab).save_vocab(os.path.join(directory, "vocab.txt"))
    arch = {
        "vocab_size": config.vocab_size,
        "hidden_size": config.hidden_size,
        "num_layers": config.num_layers,
        "num_heads": config.num_heads,
        "intermediate_size": config.intermediate_size,
        "max_position": config.max_position,
        "pooling": config.pooling,
    }
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(
            {"format": "ragfin-domain-encoder-v1", "arch": arch,
             "collapse_numbers": True, "meta": meta or {}},
            f, indent=2,
        )
    return directory


def load_encoder_checkpoint(directory: str):
    """Returns (params, tokenizer, MiniLMConfig, meta). Raises on any
    missing/invalid piece — callers decide the fallback policy."""
    from .minilm import MiniLMConfig
    from .tokenizer import WordPieceTokenizer

    with open(os.path.join(directory, "config.json")) as f:
        spec = json.load(f)
    if spec.get("format") != "ragfin-domain-encoder-v1":
        raise ValueError(f"unknown checkpoint format in {directory}")
    arch = spec["arch"]
    config = MiniLMConfig(
        vocab_size=arch["vocab_size"],
        hidden_size=arch["hidden_size"],
        num_layers=arch["num_layers"],
        num_heads=arch["num_heads"],
        intermediate_size=arch["intermediate_size"],
        max_position=arch["max_position"],
        pooling=arch.get("pooling", "mean"),
    )
    with np.load(os.path.join(directory, "params.npz")) as archive:
        params = _unflatten_params({k: archive[k] for k in archive.files})
    tokenizer = WordPieceTokenizer.from_vocab_file(
        os.path.join(directory, "vocab.txt"),
        max_len=arch["max_position"],
        collapse_numbers=bool(spec.get("collapse_numbers", True)),
    )
    if tokenizer.vocab_size > config.vocab_size:
        raise ValueError(
            f"vocab.txt has {tokenizer.vocab_size} entries > embedding table {config.vocab_size}"
        )
    return params, tokenizer, config, spec.get("meta", {})


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def _fixed_len(ids: np.ndarray, mask: np.ndarray, length: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad/trim a tokenized batch to an exact static length (scan shapes)."""
    b, s = ids.shape
    if s >= length:
        return ids[:, :length], mask[:, :length]
    pad = length - s
    return (
        np.pad(ids, ((0, 0), (0, pad))),
        np.pad(mask, ((0, 0), (0, pad))),
    )


def train_domain_encoder(
    steps: int = 2000,
    batch_size: int = 256,
    num_layers: int = 4,
    vocab_budget: int = 8192,
    query_len: int = 64,
    doc_len: int = 192,
    learning_rate: float = 3e-4,
    warmup: int = 100,
    temperature: float = 0.05,
    scan_chunk: int = 25,
    seed: int = 0,
    ckpt_dir: str = DEFAULT_CKPT_DIR,
    vocab_extra_texts: Optional[list[str]] = None,
    save_every_chunks: int = 8,
    init_from: Optional[str] = None,
    log=print,
) -> dict:
    """Train the domain encoder and write the checkpoint. Returns metrics.

    Runs on whatever platform jax is configured for — the TPU through the
    tunnel by default (scan-chunked so tunnel dispatch cost is amortized),
    or CPU when pinned (tests / tunnel-down fallback).

    ``init_from``: warm-start from an existing checkpoint directory — reuses
    its vocabulary/tokenizer and architecture verbatim (``num_layers`` /
    ``vocab_budget`` / ``vocab_extra_texts`` are ignored) and initializes
    params from it. This turns a data-mixture revision (e.g. the v5
    fragment-positive pairs) into a short fine-tune instead of a full
    from-scratch run: the ~51-min v4 recipe spends most of its wall time on
    vocabulary construction and host tokenization that a warm start skips
    or shortens.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from .minilm import MiniLMConfig, MiniLMEncoder, init_params
    from .pairgen import corpus_sample, pair_batch
    from .tokenizer import WordPieceTokenizer, build_wordpiece_vocab
    from .training import init_train_state, make_train_step

    t0 = time.perf_counter()
    rng = np.random.default_rng(seed)

    if init_from is not None:
        # Warm start: vocabulary, architecture, and params all come from the
        # parent checkpoint so the fine-tuned model is drop-in compatible
        # (same tokenizer ⇒ same featurization; only params change).
        params, tokenizer, config, parent_meta = load_encoder_checkpoint(init_from)
        vocab = tokenizer.vocab
        # Sequences must fit the parent's position table — silently longer
        # inputs would gather out-of-range position embeddings (NaN).
        query_len = min(query_len, config.max_position)
        doc_len = min(doc_len, config.max_position)
        log(
            f"[{time.perf_counter()-t0:6.1f}s] warm start from {init_from}: "
            f"{len(vocab)} tokens, parent steps={parent_meta.get('steps')}, "
            f"lens q={query_len}/d={doc_len}"
        )
    else:
        # 1. Domain vocabulary from a generated corpus sample (+ the production
        # chunk texts when available — building a vocab from the corpus an index
        # will serve is standard practice, not leakage: eval questions are held
        # out and share only the idiom lexicon).
        vocab_texts = corpus_sample(4000, seed=seed)
        if vocab_extra_texts:
            vocab_texts = vocab_texts + list(vocab_extra_texts)
        vocab = build_wordpiece_vocab(vocab_texts, vocab_size=vocab_budget)
        # Round the embedding table up to a lane-friendly multiple of 128.
        table_size = -(-len(vocab) // 128) * 128
        tokenizer = WordPieceTokenizer(vocab=vocab, max_len=doc_len, collapse_numbers=True)
        log(f"[{time.perf_counter()-t0:6.1f}s] vocab: {len(vocab)} tokens (table {table_size})")

        config = MiniLMConfig(
            vocab_size=table_size,
            num_layers=num_layers,
            max_position=max(doc_len, query_len),
        )
        params = init_params(config, seed=seed)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    log(
        f"[{time.perf_counter()-t0:6.1f}s] model: {config.num_layers} layers, "
        f"{n_params/1e6:.1f}M params"
    )

    warmup = min(warmup, max(1, steps // 10))  # decay span must stay positive
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=learning_rate, warmup_steps=warmup, decay_steps=steps
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=0.01),
    )

    def apply_fn(p, side):
        return MiniLMEncoder(config).apply(p, side["input_ids"], side["attention_mask"])

    step_fn = make_train_step(apply_fn, optimizer, temperature=temperature)

    def multi_step(state, stacked):
        return jax.lax.scan(step_fn, state, stacked)

    multi_step = jax.jit(multi_step, donate_argnums=(0,))
    state = init_train_state(params, optimizer)

    def host_batches(k: int):
        """k tokenized batches stacked to [k, B, S] int32 pytrees."""
        qi, qm, di, dm = [], [], [], []
        for _ in range(k):
            queries, docs = pair_batch(rng, batch_size)
            ids, mask = tokenizer.encode_batch(queries)
            ids, mask = _fixed_len(ids, mask, query_len)
            qi.append(ids)
            qm.append(mask)
            ids, mask = tokenizer.encode_batch(docs)
            ids, mask = _fixed_len(ids, mask, doc_len)
            di.append(ids)
            dm.append(mask)
        return {
            "query": {"input_ids": np.stack(qi), "attention_mask": np.stack(qm)},
            "doc": {"input_ids": np.stack(di), "attention_mask": np.stack(dm)},
        }

    history: list[dict] = []
    done = 0
    chunk_idx = 0
    while done < steps:
        k = min(scan_chunk, steps - done)
        stacked = host_batches(k)
        t_host = time.perf_counter()
        state, metrics = multi_step(state, stacked)
        loss = np.asarray(metrics["loss"])
        acc = np.asarray(metrics["accuracy"])
        done += k
        chunk_idx += 1
        record = {
            "step": done,
            "loss": float(loss[-1]),
            "loss_mean": float(loss.mean()),
            "accuracy": float(acc[-1]),
            "chunk_s": round(time.perf_counter() - t_host, 2),
        }
        history.append(record)
        log(
            f"[{time.perf_counter()-t0:6.1f}s] step {done}/{steps} "
            f"loss {record['loss']:.4f} acc {record['accuracy']:.3f} "
            f"({record['chunk_s']}s/chunk)"
        )
        if chunk_idx % save_every_chunks == 0 or done >= steps:
            meta = {
                "steps": done,
                "init_from": init_from,
                "batch_size": batch_size,
                "final_loss": record["loss"],
                "final_accuracy": record["accuracy"],
                "seed": seed,
                "platform": jax.devices()[0].platform,
                "wall_s": round(time.perf_counter() - t0, 1),
                "history_tail": history[-4:],
            }
            save_encoder_checkpoint(ckpt_dir, state.params, vocab, config, meta)
            log(f"[{time.perf_counter()-t0:6.1f}s] checkpoint -> {ckpt_dir} (step {done})")

    return {
        "ckpt_dir": ckpt_dir,
        "steps": steps,
        "history": history,
        "final_loss": history[-1]["loss"] if history else None,
        "final_accuracy": history[-1]["accuracy"] if history else None,
        "wall_s": round(time.perf_counter() - t0, 1),
    }
