"""Pipeline parallelism: GPipe-style microbatch pipeline over a ``pp`` axis.

The retrieval models here are shallow (MiniLM-L6), so pipeline parallelism is
not load-bearing for the product — it exists to make the framework's
parallelism toolkit complete (dp × tp in models/training.py, corpus sharding
in parallel/sharded.py, pp here) and is exercised by the multichip dryrun.

Design: a stack of L residual layers is split into contiguous blocks of
L/P layers per stage (parameter dim 0 sharded on ``pp``). Activations flow
stage-to-stage with ``jax.lax.ppermute`` under ``shard_map``; the schedule
runs M + P - 1 ticks for M microbatches (fill + drain), stage 0 ingesting a
fresh microbatch per tick and the last stage banking finished ones. The whole
schedule is a ``lax.scan``, so ``jax.grad`` differentiates straight through
the pipeline (gradients ride the reverse ppermutes)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_pipeline_params(key, n_layers: int, dim: int, scale: float = 0.1):
    """Stacked residual-MLP layer weights [L, d, d]."""
    return scale * jax.random.normal(key, (n_layers, dim, dim), jnp.float32)


def _local_forward(local_params, x):
    """Run this stage's block of layers sequentially (residual tanh MLP)."""

    def layer(x, w):
        return x + jnp.tanh(x @ w), None

    out, _ = jax.lax.scan(layer, x, local_params)
    return out


def sequential_forward(params, x):
    """Single-device reference: all L layers in order."""
    return _local_forward(params, x)


def make_pipeline_forward(mesh: Mesh, axis: str = "pp") -> Callable:
    """Build forward(params [L,d,d] sharded on dim0, microbatches [M,B,d])
    → outputs [M,B,d] (replicated), numerically identical to
    :func:`sequential_forward` per microbatch."""
    n_stages = mesh.shape[axis]

    def local_fn(params_local, microbatches):
        stage = jax.lax.axis_index(axis)
        m = microbatches.shape[0]
        ticks = m + n_stages - 1
        batch_shape = microbatches.shape[1:]

        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            cur, outputs = carry
            fresh = microbatches[jnp.clip(t, 0, m - 1)]
            x_in = jnp.where(stage == 0, fresh, cur)
            y = _local_forward(params_local, x_in)
            # Last stage banks microbatch t-(P-1) once the pipe is full.
            out_idx = jnp.clip(t - (n_stages - 1), 0, m - 1)
            bank = (stage == n_stages - 1) & (t >= n_stages - 1)
            outputs = outputs.at[out_idx].set(jnp.where(bank, y, outputs[out_idx]))
            cur_next = jax.lax.ppermute(y, axis, perm)
            return (cur_next, outputs), None

        init = (
            jnp.zeros(batch_shape, jnp.float32),
            jnp.zeros((m,) + batch_shape, jnp.float32),
        )
        (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(ticks))
        # Only the last stage holds real outputs; masked psum replicates them.
        mask = (stage == n_stages - 1).astype(jnp.float32)
        return jax.lax.psum(outputs * mask, axis)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, None, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn


def make_pipeline_train_step(mesh: Mesh, learning_rate: float = 1e-2, axis: str = "pp"):
    """(params, microbatches, targets) → (params', loss): SGD on MSE through
    the pipeline (grads flow through ppermute reverses)."""
    forward = make_pipeline_forward(mesh, axis)

    def loss_fn(params, microbatches, targets):
        preds = forward(params, microbatches)
        return jnp.mean((preds - targets) ** 2)

    @jax.jit
    def step(params, microbatches, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, microbatches, targets)
        return params - learning_rate * grads, loss

    return step


def place_pipeline_params(params, mesh: Mesh, axis: str = "pp"):
    return jax.device_put(params, NamedSharding(mesh, P(axis, None, None)))
