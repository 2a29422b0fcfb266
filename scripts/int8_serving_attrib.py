"""Attribute the int8-vs-bf16 SERVING-shape device gap at 1M.

serving_e2e measured int8 p50 149-192 ms vs bf16 93-109 ms across windows
after the exact-repair change — but `serving_topk_1m` shows lax.top_k(64)
costs only ~3.7 ms device, so the widened shortlist cannot explain it.
This probe times the actual production device programs at the serving
shape [G, Q=8, 1M] (amortized in one scan, tunnel dispatch excluded):

  bf16_k3    — cosine_topk_dense_multi, k=3   (bf16 serving today)
  bf16_k16   — cosine_topk_dense_multi, k=16
  int8_k3    — cosine_topk_dense_multi_int8, k=3   (pre-repair int8)
  int8_k16   — cosine_topk_dense_multi_int8, k=16  (repair widening)
  int8_k64   — cosine_topk_dense_multi_int8, k=64  (old widening)

Whatever gap remains between bf16_k3 and int8_k16 is the int8 dense
kernel itself (int8 MXU matmul at tiny Q + dequant materialization), not
the selection width.

Usage: python scripts/int8_serving_attrib.py [G]  (default 2)
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

N, Q, D = 1_000_000, 8, 384
G = int(sys.argv[1]) if len(sys.argv) > 1 else 2
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_results.log")


def main() -> None:
    from ragfin_tpu.ops.quantize import quantize_corpus_t
    from ragfin_tpu.ops.topk import (
        cosine_topk_dense_multi,
        cosine_topk_dense_multi_int8,
    )

    @jax.jit
    def gen(key):
        x = jax.random.normal(key, (D, N), jnp.bfloat16)
        n2 = jnp.einsum("dn,dn->n", x, x, preferred_element_type=jnp.float32)
        return x * jax.lax.rsqrt(n2 + 1e-12)[None, :].astype(jnp.bfloat16)

    ct = gen(jax.random.PRNGKey(0))
    np.asarray(ct[0, 0])
    c8, sc = quantize_corpus_t(ct)
    np.asarray(c8[0, 0])
    qs = jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.float32)
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
    masks = jnp.asarray(np.random.default_rng(2).random((G, N)) < 0.5)

    def timed(fn, *args):
        @jax.jit
        def run(*a):
            def step(carry, _):
                s, i = fn(*a)
                return carry + s.sum() + i.astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(step, 0.0, jnp.arange(8))
            return acc

        np.asarray(run(*args))
        t0 = time.perf_counter()
        np.asarray(run(*args))
        return (time.perf_counter() - t0) / 8 * 1e3

    times = {
        "bf16_k3": timed(lambda q, c, m: cosine_topk_dense_multi(q, c, 3, m, n_valid=N), qs, ct, masks),
        "bf16_k16": timed(lambda q, c, m: cosine_topk_dense_multi(q, c, 16, m, n_valid=N), qs, ct, masks),
        "int8_k3": timed(lambda q, c, s, m: cosine_topk_dense_multi_int8(q, c, s, 3, m, n_valid=N), qs, c8, sc, masks),
        "int8_k16": timed(lambda q, c, s, m: cosine_topk_dense_multi_int8(q, c, s, 16, m, n_valid=N), qs, c8, sc, masks),
        "int8_k64": timed(lambda q, c, s, m: cosine_topk_dense_multi_int8(q, c, s, 64, m, n_valid=N), qs, c8, sc, masks),
    }
    line = "int8_serving_attrib G=%d Q=%d N=1M: %s ms/batch" % (
        G, Q, " ".join(f"{k}={v:.2f}" for k, v in times.items()),
    )
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
