"""Decompose the 1M-chunk SERVING-shape device cost: the tier-group path
(ops/topk.py cosine_topk_dense_multi) is matmul + mask + lax.top_k over
[G, Q, N]. lax.top_k is a sort-based selection that dominates at large N;
jax.lax.approx_max_k is the TPU-native alternative (PartialReduce op).

Times, at the single-question serving shape (Q=8 after batching, G tiers):
  mm        — matmul + mask + row-max only (the floor)
  topk      — + lax.top_k(k=64)            (production today)
  approx    — + lax.approx_max_k(k=64, recall_target=0.99)
  approx95  — + lax.approx_max_k(k=64, recall_target=0.95)
plus the measured recall of approx vs exact on the same scores.

Usage: python scripts/topk_serving_probe.py [G] (default 2)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from ragfin_tpu.utils.device import enable_compilation_cache

enable_compilation_cache()

N, Q, D, K = 1_000_000, 8, 384, 64
G = int(sys.argv[1]) if len(sys.argv) > 1 else 2
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_results.log")


def main() -> None:
    @jax.jit
    def gen(key):
        x = jax.random.normal(key, (D, N), jnp.bfloat16)
        n2 = jnp.einsum("dn,dn->n", x, x, preferred_element_type=jnp.float32)
        return x * jax.lax.rsqrt(n2 + 1e-12)[None, :].astype(jnp.bfloat16)

    ct = gen(jax.random.PRNGKey(0))
    qs = jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.float32)
    qs = (qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    masks = jnp.asarray(np.random.default_rng(2).random((G, N)) < 0.5)
    np.asarray(ct[0, 0])

    def scores_of(q, c, m):
        s = jnp.dot(q, c, preferred_element_type=jnp.float32)
        return jnp.where(m[:, None, :], s[None], -jnp.inf)  # [G, Q, N]

    def run_mode(mode):
        def body(q, c, m):
            s = scores_of(q, c, m)
            if mode == "mm":
                return jnp.max(s, axis=-1).sum()
            if mode == "topk":
                ts, ti = jax.lax.top_k(s, K)
            elif mode == "approx":
                ts, ti = jax.lax.approx_max_k(s, K, recall_target=0.99)
            else:
                ts, ti = jax.lax.approx_max_k(s, K, recall_target=0.95)
            return ts.sum() + ti.astype(jnp.float32).sum()

        @jax.jit
        def run(q, c, m):
            def step(carry, _):
                return carry + body(q, c, m), None
            acc, _ = jax.lax.scan(step, 0.0, jnp.arange(8))
            return acc

        np.asarray(run(qs, ct, masks))
        t0 = time.perf_counter()
        np.asarray(run(qs, ct, masks))
        return (time.perf_counter() - t0) / 8 * 1e3

    times = {m: run_mode(m) for m in ("mm", "topk", "approx", "approx95")}

    # Recall of approx vs exact on identical scores (one tier, one batch).
    @jax.jit
    def both(q, c, m):
        s = scores_of(q, c, m)
        _, exact_i = jax.lax.top_k(s, K)
        _, ap_i = jax.lax.approx_max_k(s, K, recall_target=0.99)
        _, ap95_i = jax.lax.approx_max_k(s, K, recall_target=0.95)
        return exact_i, ap_i, ap95_i

    ei, ai, a95 = (np.asarray(x) for x in both(qs, ct, masks))
    rec = np.mean([
        len(set(ei[g, q]) & set(ai[g, q])) / K for g in range(G) for q in range(Q)
    ])
    rec95 = np.mean([
        len(set(ei[g, q]) & set(a95[g, q])) / K for g in range(G) for q in range(Q)
    ])
    line = (
        f"serving_topk_1m G={G} Q={Q} K={K}: mm={times['mm']:.2f} "
        f"topk={times['topk']:.2f} approx={times['approx']:.2f} "
        f"approx95={times['approx95']:.2f} ms/batch "
        f"recall@64 approx={rec:.4f} approx95={rec95:.4f}"
    )
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
