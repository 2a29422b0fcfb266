"""Sequence(context)-parallel MiniLM forward (parallel/minilm_sp.py):
numerical parity with the single-device encoder on the 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragfin_tpu.models.minilm import MiniLMConfig, MiniLMEncoder, init_params
from ragfin_tpu.parallel.mesh import make_mesh
from ragfin_tpu.parallel.minilm_sp import make_minilm_sp_forward


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(("sp",))


CFG = MiniLMConfig(
    vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position=64, dtype=jnp.float32,
)


class TestSequenceParallel:
    def test_forward_parity(self, mesh):
        params = init_params(CFG, seed=3)
        rng = np.random.default_rng(0)
        b, s = 3, 32  # 4 tokens per device on sp=8
        ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (b, s)), jnp.int32)
        mask = jnp.asarray((rng.uniform(size=(b, s)) > 0.2).astype(np.int32))
        mask = mask.at[:, 0].set(1)  # at least one real token per row

        out_sp = make_minilm_sp_forward(mesh, CFG)(params, ids, mask)
        ref = MiniLMEncoder(CFG).apply(params, ids, mask)
        np.testing.assert_allclose(np.asarray(out_sp), np.asarray(ref), atol=1e-5)

    def test_cls_pooling_parity(self, mesh):
        cfg = MiniLMConfig(
            vocab_size=128, hidden_size=32, num_layers=1, num_heads=4,
            intermediate_size=64, max_position=64, dtype=jnp.float32,
            pooling="cls",
        )
        params = init_params(cfg, seed=5)
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 16)), jnp.int32)
        mask = jnp.ones((2, 16), jnp.int32)
        out_sp = make_minilm_sp_forward(mesh, cfg)(params, ids, mask)
        ref = MiniLMEncoder(cfg).apply(params, ids, mask)
        np.testing.assert_allclose(np.asarray(out_sp), np.asarray(ref), atol=1e-5)

    def test_rejects_indivisible_sequence(self, mesh):
        params = init_params(CFG, seed=3)
        fwd = make_minilm_sp_forward(mesh, CFG)
        with pytest.raises(ValueError, match="not divisible"):
            fwd(params, jnp.ones((1, 30), jnp.int32), jnp.ones((1, 30), jnp.int32))
