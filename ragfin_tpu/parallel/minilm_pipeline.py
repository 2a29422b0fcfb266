"""Pipeline-parallel MiniLM encoder: GPipe over the transformer stack.

Round-1 verdict #6: the generic residual-MLP pipeline demo
(:mod:`ragfin_tpu.parallel.pipeline`) becomes a capability of the flagship
model. The MiniLM-L6 encoder (:mod:`ragfin_tpu.models.minilm`) splits its 6
transformer layers into contiguous blocks of L/P per pipeline stage
(2 stages × 3 layers on a pp=2 mesh); embeddings and pooling are cheap and
run replicated around the pipeline.

Mechanics: layer parameters are stacked into leading-axis-[L] pytrees and
sharded on the ``pp`` mesh axis; activations (hidden states) flow
stage-to-stage with ``jax.lax.ppermute`` on the GPipe fill+drain schedule
(M + P - 1 ticks for M microbatches); the attention mask is replicated and
indexed by each stage's in-flight microbatch id. The schedule is one
``lax.scan`` so ``jax.grad`` differentiates straight through (reverse
ppermutes carry the activation gradients). An optional ``dp`` mesh axis
shards the microbatch batch dimension; gradients are psum'd over it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.minilm import MiniLMConfig, TransformerLayer


# --- parameter restructuring -------------------------------------------------

def split_minilm_params(params: dict, config: MiniLMConfig):
    """MiniLMEncoder params → (embed/pool params, stacked layer pytree [L, ...])."""
    p = params["params"]
    layers = [p[f"layer_{i}"] for i in range(config.num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)
    outer = {k: v for k, v in p.items() if not k.startswith("layer_")}
    return outer, stacked


def merge_minilm_params(outer: dict, stacked, config: MiniLMConfig) -> dict:
    """Inverse of :func:`split_minilm_params`."""
    p = dict(outer)
    for i in range(config.num_layers):
        p[f"layer_{i}"] = jax.tree.map(lambda a, i=i: a[i], stacked)
    return {"params": p}


# --- replicated stages -------------------------------------------------------

def embed_stage(outer: dict, input_ids, config: MiniLMConfig):
    """Token+position+type embeddings + layernorm (MiniLMEncoder.__call__
    head, minilm.py:116-129), functional over the outer param dict."""
    seq = input_ids.shape[-1]
    x = (
        outer["word_embeddings"]["embedding"][input_ids]
        + outer["position_embeddings"]["embedding"][:seq][None, :, :]
        + outer["token_type_embeddings"]["embedding"][0][None, None, :]
    )
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + config.layer_norm_eps)
    x = x * outer["embeddings_norm"]["scale"] + outer["embeddings_norm"]["bias"]
    return x.astype(config.dtype)


def pool_stage(x, attention_mask, config: MiniLMConfig):
    """Mean pooling over real tokens + L2 norm (minilm.py:132-140)."""
    mask = attention_mask.astype(bool)
    if config.pooling == "cls":
        pooled = x[..., 0, :].astype(jnp.float32)
    else:
        w = mask.astype(jnp.float32)[..., None]
        pooled = jnp.sum(x.astype(jnp.float32) * w, axis=-2) / jnp.maximum(
            jnp.sum(w, axis=-2), 1e-9
        )
    return pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


# --- pipelined transformer stack ----------------------------------------------

def make_minilm_pp_forward(
    mesh: Mesh,
    config: MiniLMConfig,
    pp_axis: str = "pp",
    dp_axis: Optional[str] = None,
):
    """Build forward(params, input_ids [M,B,S], attention_mask [M,B,S]) →
    unit embeddings [M,B,H], numerically equal to the single-device
    MiniLMEncoder forward per microbatch.

    ``params`` is the plain MiniLMEncoder pytree; stacking/sharding happens
    inside so callers keep the standard checkpoint layout.
    """
    n_stages = mesh.shape[pp_axis]
    if config.num_layers % n_stages:
        raise ValueError(f"{config.num_layers} layers do not split over {n_stages} stages")
    layer_mod = TransformerLayer(config)

    def block(stacked_local, x, mask):
        def body(h, layer_params):
            return layer_mod.apply({"params": layer_params}, h, mask), None

        out, _ = jax.lax.scan(body, x, stacked_local)
        return out

    def local_fn(stacked_local, hidden_mb, mask_mb):
        # hidden_mb [M, B_local, S, H], mask_mb [M, B_local, S]
        stage = jax.lax.axis_index(pp_axis)
        m = hidden_mb.shape[0]
        ticks = m + n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            cur, outputs = carry
            fresh = hidden_mb[jnp.clip(t, 0, m - 1)]
            x_in = jnp.where(stage == 0, fresh, cur)
            # Microbatch in flight at this stage on tick t is (t - stage).
            mb = jnp.clip(t - stage, 0, m - 1)
            y = block(stacked_local, x_in, mask_mb[mb])
            out_idx = jnp.clip(t - (n_stages - 1), 0, m - 1)
            bank = (stage == n_stages - 1) & (t >= n_stages - 1)
            outputs = outputs.at[out_idx].set(
                jnp.where(bank, y.astype(outputs.dtype), outputs[out_idx])
            )
            cur_next = jax.lax.ppermute(y, pp_axis, perm)
            return (cur_next, outputs), None

        init = (
            jnp.zeros(hidden_mb.shape[1:], hidden_mb.dtype),
            jnp.zeros(hidden_mb.shape, hidden_mb.dtype),
        )
        (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(ticks))
        mask = (stage == n_stages - 1).astype(outputs.dtype)
        return jax.lax.psum(outputs * mask, pp_axis)

    data_spec = P(None, dp_axis) if dp_axis else P()
    pipelined = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(pp_axis), data_spec, data_spec),
        out_specs=data_spec,
        check_vma=False,
    )

    # jit the whole composition: an eager shard_map re-traces per call
    # (~2.7 s/call through the tunnel — see CLAUDE.md / sharded.py).
    @jax.jit
    def forward(params, input_ids, attention_mask):
        outer, stacked = split_minilm_params(params, config)
        hidden = embed_stage(outer, input_ids, config)  # [M, B, S, H]
        hidden = pipelined(stacked, hidden, attention_mask.astype(hidden.dtype))
        return pool_stage(hidden, attention_mask, config)

    return forward


def make_minilm_pp_train_step(
    mesh: Mesh,
    config: MiniLMConfig,
    pp_axis: str = "pp",
    dp_axis: Optional[str] = None,
    learning_rate: float = 1e-3,
):
    """SGD train step over the pp(+dp) mesh: MSE pull of microbatch
    embeddings toward targets; grads flow through the pipeline scan and are
    reduced across dp by GSPMD."""
    forward = make_minilm_pp_forward(mesh, config, pp_axis, dp_axis)

    def loss_fn(params, input_ids, attention_mask, targets):
        emb = forward(params, input_ids, attention_mask)
        return jnp.mean((emb - targets) ** 2)

    @jax.jit
    def step(params, input_ids, attention_mask, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, input_ids, attention_mask, targets)
        params = jax.tree.map(lambda p, g: p - learning_rate * g, params, grads)
        return params, loss

    return step


def place_minilm_pp_params(params, mesh: Mesh, config: MiniLMConfig, pp_axis: str = "pp"):
    """Device placement helper: returns the same pytree with stacked layer
    leaves laid out on the pp axis (XLA then keeps each stage's block
    chip-local). Callers may skip this — GSPMD will move data — but explicit
    placement avoids a first-step reshuffle."""
    outer, stacked = split_minilm_params(params, config)
    stacked = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(pp_axis))), stacked
    )
    return merge_minilm_params(
        jax.tree.map(lambda a: jax.device_put(a, NamedSharding(mesh, P())), outer),
        stacked,
        config,
    )
