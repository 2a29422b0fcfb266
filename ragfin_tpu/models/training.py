"""Contrastive training of the embedding model (in-batch negatives, InfoNCE).

The reference's embedder is frozen (pretrained MiniLM,
``chunking_storing (1).py:8``); this module makes the rebuild's encoder
*trainable* so retrieval quality can be tuned on labeled QA pairs
(``qa_subset.json`` question → expected-chunk pairs). The same step function
drives both the bag encoder (projection-table params) and the MiniLM-class
transformer (:mod:`ragfin_tpu.models.minilm`) — any encoder expressed as
``apply(params, batch) -> [B, D] embeddings``.

Multi-chip: the step is jit-compiled with NamedShardings — batch sharded on
the ``dp`` mesh axis, wide parameter dimensions on ``tp`` — and GSPMD inserts
the ICI collectives (all-gather of document embeddings for in-batch
negatives, psum for grads).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .bag_encoder import bag_encode

EncoderApply = Callable[[Any, dict], jax.Array]  # (params, batch_side) -> [B, D]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def bag_apply(params: Any, side: dict) -> jax.Array:
    """Encoder-apply adapter for the bag encoder (params = projection table)."""
    return bag_encode(params, side["ids"], side["weights"])


def info_nce_loss(
    q_emb: jax.Array, d_emb: jax.Array, temperature: float = 0.05
) -> jax.Array:
    """Symmetric InfoNCE over in-batch negatives.

    [B, D] unit embeddings both sides; positives on the diagonal. Under dp
    sharding GSPMD all-gathers the [B, D] factors to form the [B, B] logits.
    """
    logits = q_emb @ d_emb.T / temperature
    labels = jnp.arange(logits.shape[0])
    loss_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return (loss_qd.mean() + loss_dq.mean()) / 2


def make_train_step(
    apply_fn: EncoderApply,
    optimizer: optax.GradientTransformation,
    temperature: float = 0.05,
):
    """Build a jittable (state, batch) -> (state, metrics) step.

    ``batch = {"query": side, "doc": side}`` where each side is whatever
    ``apply_fn`` consumes (token ids / feature ids + weights).
    """

    def loss_fn(params, batch):
        q = apply_fn(params, batch["query"])
        d = apply_fn(params, batch["doc"])
        loss = info_nce_loss(q, d, temperature)
        acc = jnp.mean(
            jnp.argmax(q @ d.T, axis=1) == jnp.arange(q.shape[0])
        )
        return loss, acc

    def train_step(state: TrainState, batch) -> tuple[TrainState, dict]:
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {"loss": loss, "accuracy": acc}

    return train_step


def init_train_state(params: Any, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))
