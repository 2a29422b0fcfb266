"""Pipeline-parallel MiniLM (round-1 verdict #6): pp forward must match the
single-device encoder to 1e-5; train step runs on a pp×dp mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ragfin_tpu.models.minilm import MiniLMConfig, MiniLMEncoder, init_params
from ragfin_tpu.parallel.minilm_pipeline import (
    make_minilm_pp_forward,
    make_minilm_pp_train_step,
    merge_minilm_params,
    place_minilm_pp_params,
    split_minilm_params,
)

CFG = MiniLMConfig(
    vocab_size=211, hidden_size=48, num_layers=6, num_heads=4,
    intermediate_size=96, max_position=32, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=1, seq_len=16)


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _batch(m, b, s, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, CFG.vocab_size, (m, b, s)).astype(np.int32)
    mask = np.ones((m, b, s), np.int32)
    mask[:, :, s - 3 :] = 0  # ragged tail exercises mask plumbing
    return jnp.asarray(ids), jnp.asarray(mask)


class TestSplitMerge:
    def test_roundtrip(self, params):
        outer, stacked = split_minilm_params(params, CFG)
        again = merge_minilm_params(outer, stacked, CFG)
        a_leaves = {
            jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(params)
        }
        b_leaves = {
            jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(again)
        }
        assert set(a_leaves) == set(b_leaves)
        for k in a_leaves:
            np.testing.assert_array_equal(a_leaves[k], b_leaves[k])


class TestPipelineForward:
    @pytest.mark.parametrize("stages", [2, 3])
    def test_matches_single_device(self, params, stages):
        mesh = _mesh((stages,), ("pp",))
        fwd = make_minilm_pp_forward(mesh, CFG)
        ids, mask = _batch(m=4, b=3, s=16)
        out_pp = np.asarray(fwd(params, ids, mask))

        model = MiniLMEncoder(CFG)
        for mb in range(4):
            ref = np.asarray(model.apply(params, ids[mb], mask[mb]))
            np.testing.assert_allclose(out_pp[mb], ref, atol=1e-5, rtol=1e-5)

    def test_placed_params_same_result(self, params):
        mesh = _mesh((2,), ("pp",))
        fwd = make_minilm_pp_forward(mesh, CFG)
        ids, mask = _batch(m=2, b=2, s=16)
        base = np.asarray(fwd(params, ids, mask))
        placed = place_minilm_pp_params(params, mesh, CFG)
        np.testing.assert_allclose(np.asarray(fwd(placed, ids, mask)), base, atol=1e-6)

    def test_indivisible_layer_split_raises(self, params):
        mesh = _mesh((4,), ("pp",))
        with pytest.raises(ValueError):
            make_minilm_pp_forward(mesh, CFG)  # 6 layers over 4 stages


class TestPipelineTraining:
    def test_train_step_pp_dp(self, params):
        mesh = _mesh((2, 2), ("pp", "dp"))
        step = make_minilm_pp_train_step(mesh, CFG, dp_axis="dp", learning_rate=1e-2)
        ids, mask = _batch(m=2, b=4, s=16, seed=3)
        targets = jnp.asarray(
            np.random.default_rng(4).standard_normal((2, 4, CFG.hidden_size)), jnp.float32
        )
        p = params
        losses = []
        for _ in range(4):
            p, loss = step(p, ids, mask, targets)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]  # actually learning through the pipe

    def test_grads_flow_to_all_stages(self, params):
        mesh = _mesh((2,), ("pp",))
        fwd = make_minilm_pp_forward(mesh, CFG)
        ids, mask = _batch(m=2, b=2, s=16, seed=5)

        def loss(p):
            return jnp.sum(fwd(p, ids, mask) ** 2)

        grads = jax.grad(loss)(params)
        _, stacked_g = split_minilm_params(grads, CFG)
        leaf = jax.tree_util.tree_leaves(stacked_g)[0]  # [L, ...]
        per_layer = np.asarray(jnp.sum(jnp.abs(leaf), axis=tuple(range(1, leaf.ndim))))
        assert (per_layer > 0).all()  # every layer (both stages) got gradient
