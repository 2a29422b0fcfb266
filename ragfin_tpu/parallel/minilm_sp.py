"""Sequence(context)-parallel MiniLM encoder: tokens sharded over the mesh.

The remaining parallel axis of the flagship encoder (dp/tp in
``__graft_entry__``, pp in :mod:`minilm_pipeline`, cell-sharded retrieval in
:mod:`sharded_ivf`): the SEQUENCE dimension is sharded over ``sp`` devices —
each device embeds and transforms its S/P token slice, and only attention
needs cross-device data, supplied by all-gathering the (small) K/V
projections per layer. This is the standard context-parallel decomposition:

- per-token ops (embeddings, layernorm, FFN, residuals) are local — tokens
  never talk to each other outside attention;
- attention computes LOCAL query rows against the FULL gathered key/value
  (ICI traffic per layer: ``2 * B * S * H`` halves, independent of P), the
  memory-efficient layout for long documents where activations, not
  weights, dominate HBM;
- mean pooling finishes with one masked ``psum`` pair over ``sp``.

Numerically equal to the single-device ``MiniLMEncoder`` forward (parity
asserted in tests and the multichip dryrun). Reference anchor: the
embedder the reference calls per chunk/query (``chunking_storing (1).py:8``,
``retrieve.py:27``) — here scaled along the sequence axis instead of being
bound to one device's memory.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.minilm import MiniLMConfig


def _dense(p, x):
    return jnp.dot(x, p["kernel"].astype(x.dtype)) + p["bias"].astype(x.dtype)


def _layernorm(p, x, eps):
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return x * p["scale"] + p["bias"]


def make_minilm_sp_forward(mesh: Mesh, config: MiniLMConfig, sp_axis: str = "sp"):
    """Build ``forward(params, input_ids [B,S], attention_mask [B,S]) →
    unit embeddings [B,H]`` with S sharded over ``sp_axis``.

    ``params`` is the plain :class:`MiniLMEncoder` pytree (standard
    checkpoint layout); it stays replicated — sequence parallelism shards
    activations, not weights (compose with tp for that).
    """
    n_sp = mesh.shape[sp_axis]
    cfg = config
    eps = cfg.layer_norm_eps

    def local_fn(params, ids_local, mask_local):
        p = params["params"]
        shard = jax.lax.axis_index(sp_axis)
        b, s_local = ids_local.shape
        pos0 = shard * s_local

        # ---- embeddings (global positions via the shard offset) ----------
        pos_table = p["position_embeddings"]["embedding"]
        pos_emb = jax.lax.dynamic_slice_in_dim(pos_table, pos0, s_local, 0)
        x = (
            p["word_embeddings"]["embedding"][ids_local]
            + pos_emb[None, :, :]
            + p["token_type_embeddings"]["embedding"][0][None, None, :]
        )
        x = _layernorm(p["embeddings_norm"], x, eps).astype(cfg.dtype)

        # Attention needs every key position's validity: gather the mask
        # once (bool [B, S]).
        mask_full = jax.lax.all_gather(
            mask_local.astype(bool), sp_axis, axis=1, tiled=True
        )

        for i in range(cfg.num_layers):
            lp = p[f"layer_{i}"]
            ap = lp["attention"]
            q = _dense(ap["query"], x)
            k = _dense(ap["key"], x)
            v = _dense(ap["value"], x)
            # K/V ride ICI: local [B, S/P, H] slices gather to [B, S, H].
            k = jax.lax.all_gather(k, sp_axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, sp_axis, axis=1, tiled=True)

            def split(t):  # [B, S?, H] -> [B, heads, S?, head_dim]
                bb, ss, _ = t.shape
                return t.reshape(bb, ss, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)

            qh, kh, vh = split(q), split(k), split(v)
            scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(cfg.head_dim)
            scores = jnp.where(mask_full[:, None, None, :], scores, -1e9)
            probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
            bb, hh, ss, dd = ctx.shape
            ctx = ctx.transpose(0, 2, 1, 3).reshape(bb, ss, hh * dd)
            attn = _dense(ap["output"], ctx)
            x = _layernorm(lp["attention_norm"], x + attn, eps).astype(cfg.dtype)
            h = _dense(lp["intermediate"], x)
            h = jax.nn.gelu(h, approximate=False)
            h = _dense(lp["ffn_output"], h)
            x = _layernorm(lp["ffn_norm"], x + h, eps).astype(cfg.dtype)

        # ---- masked mean pool: two psums finish the reduction ------------
        if cfg.pooling == "cls":
            # CLS lives on shard 0; psum broadcasts it (other shards add 0).
            is0 = (shard == 0).astype(jnp.float32)
            pooled = jax.lax.psum(x[:, 0, :].astype(jnp.float32) * is0, sp_axis)
        else:
            w = mask_local.astype(jnp.float32)[:, :, None]
            wsum = jax.lax.psum(jnp.sum(x.astype(jnp.float32) * w, axis=1), sp_axis)
            wcnt = jax.lax.psum(jnp.sum(w, axis=1), sp_axis)
            pooled = wsum / jnp.maximum(wcnt, 1e-9)
        return pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)

    # Jit ONCE at build time: shard_map programs re-trace on every eager
    # call (~2.7 s/call through the tunnel — CLAUDE.md), and a fresh
    # jax.jit(fn) per forward() would have an empty trace cache each time.
    jitted = jax.jit(
        shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(None, sp_axis), P(None, sp_axis)),
            out_specs=P(),
            check_vma=False,
        )
    )

    def forward(params, input_ids, attention_mask):
        if input_ids.shape[1] % n_sp:
            raise ValueError(
                f"sequence length {input_ids.shape[1]} not divisible by sp={n_sp}"
            )
        return jitted(params, input_ids, attention_mask)

    return forward
