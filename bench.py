"""Headline benchmark: exact cosine top-10 query throughput at scale.

Measures the fused Pallas matmul+k-select kernel (ragfin_tpu/ops/topk.py)
over a synthetic unit-normalized corpus of BENCH_N chunks (default 1M,
bf16-packed [D, N] in HBM, the production layout) with batches of
BENCH_Q queries, amortized over repeated batches with a forced host fetch
per batch.

``vs_baseline`` compares against the CPU reference path the benchmark
machine can actually run: numpy f32 matmul + argpartition top-k (the exact
search the reference's Milvus IVF_FLAT approximates), measured on a
subsampled corpus and scaled linearly in N (exact search cost is linear in
corpus size).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N = int(os.environ.get("BENCH_N", 1_000_000))
Q = int(os.environ.get("BENCH_Q", 1024))
K = int(os.environ.get("BENCH_K", 10))
D = 384
REPS = int(os.environ.get("BENCH_REPS", 6))


def cpu_baseline_qps(d: int = D, k: int = K) -> float:
    """Exact cosine top-k on host CPU (numpy), scaled to the full corpus."""
    n_sub, q_sub = 65_536, 64
    rng = np.random.default_rng(1)
    corpus = rng.standard_normal((n_sub, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((q_sub, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    # warmup + best of 3
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        scores = queries @ corpus.T
        part = np.argpartition(-scores, k, axis=1)[:, :k]
        np.take_along_axis(scores, part, axis=1)
        times.append(time.perf_counter() - t0)
    qps_sub = q_sub / min(times)
    return qps_sub * (n_sub / N)  # linear scaling of exact search


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ragfin_tpu.ops.topk import cosine_topk_fused

    @jax.jit
    def gen_corpus_t(key):
        x = jax.random.normal(key, (D, N), jnp.bfloat16)
        nrm2 = jnp.einsum("dn,dn->n", x, x, preferred_element_type=jnp.float32)
        return (x * jax.lax.rsqrt(nrm2 + 1e-12)[None, :].astype(jnp.bfloat16))

    @jax.jit
    def gen_queries(key):
        x = jax.random.normal(key, (Q, D), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    key = jax.random.PRNGKey(0)
    ct = gen_corpus_t(key)
    qkeys = jax.random.split(jax.random.PRNGKey(1), 4)
    queries = [gen_queries(k) for k in qkeys]
    np.asarray(ct[0, 0])
    [np.asarray(q[0, 0]) for q in queries]

    def run(q):
        s, i = cosine_topk_fused(q, ct, K, n_valid=N, precision="fast")
        np.asarray(s)
        np.asarray(i)

    run(queries[0])  # compile
    times = []
    for r in range(REPS):
        t0 = time.perf_counter()
        run(queries[r % len(queries)])
        times.append(time.perf_counter() - t0)
    qps = Q / min(times)

    baseline = cpu_baseline_qps()
    scale_tag = f"{N // 1_000_000}M" if N >= 1_000_000 else f"{N // 1000}k"
    print(
        json.dumps(
            {
                "metric": f"exact_cosine_top{K}_qps_{scale_tag}_chunks",
                "value": round(qps, 1),
                "unit": "QPS",
                "vs_baseline": round(qps / baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
