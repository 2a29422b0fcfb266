"""Headline benchmark: exact cosine top-10 query throughput at scale.

Measures the fused Pallas matmul+k-select kernel (ragfin_tpu/ops/topk.py)
over a synthetic unit-normalized corpus of BENCH_N chunks stored [D, N] in
HBM in the production layout/dtype (BENCH_DTYPE: bf16 default, int8 for the
quantized index, f32 for exact-reference), querying in batches of BENCH_Q.

Timing is amortized DEVICE time: BENCH_REPS query batches run inside one
jitted lax.scan (a single dispatch), so host/tunnel round-trip latency is
excluded from the per-batch figure (it is reported separately by the
dispatch measurement in the harness logs).

``vs_baseline`` compares against the CPU reference path this machine can
run: numpy f32 matmul + argpartition top-k (the exact search the reference's
Milvus IVF_FLAT approximates), measured on a subsample and scaled linearly
in N (exact search is linear in corpus size).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N = int(os.environ.get("BENCH_N", 1_000_000))
Q = int(os.environ.get("BENCH_Q", 1024))
K = int(os.environ.get("BENCH_K", 10))
D = 384
REPS = int(os.environ.get("BENCH_REPS", 8))
DTYPE = os.environ.get("BENCH_DTYPE", "bf16")  # bf16 | int8 | f32
# None → the kernel's measured-winner defaults (ops/topk.py _default_blocks).
BLOCK_N = int(os.environ["BENCH_BLOCK_N"]) if os.environ.get("BENCH_BLOCK_N") else None
BLOCK_Q = int(os.environ["BENCH_BLOCK_Q"]) if os.environ.get("BENCH_BLOCK_Q") else None


def cpu_baseline_qps(d: int = D, k: int = K) -> float:
    """Exact cosine top-k on host CPU (numpy), scaled to the full corpus."""
    n_sub, q_sub = 65_536, 64
    rng = np.random.default_rng(1)
    corpus = rng.standard_normal((n_sub, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((q_sub, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        scores = queries @ corpus.T
        part = np.argpartition(-scores, k, axis=1)[:, :k]
        np.take_along_axis(scores, part, axis=1)
        times.append(time.perf_counter() - t0)
    qps_sub = q_sub / min(times)
    return qps_sub * (n_sub / N)


_printed = threading.Lock()


def _print_result(obj: dict) -> None:
    """Print the ONE result line exactly once — the watchdog and the worker
    can race at the timeout boundary, and two (or interleaved) JSON lines
    would break the harness's single-line contract."""
    if _printed.acquire(blocking=False):
        print(json.dumps(obj), flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: a successful compile survives process
    # restarts, so a short healthy tunnel window is enough for later runs.
    # TPU-only: CPU AOT entries are machine-feature-specific and the loader
    # warns/SIGILLs on mismatch.
    try:
        if jax.default_backend() == "tpu":
            cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # cache is best-effort
        print(f"# compilation cache unavailable: {e}", file=sys.stderr)

    from ragfin_tpu.ops.quantize import quantize_corpus_t
    from ragfin_tpu.ops.topk import cosine_topk_fused, cosine_topk_fused_int8

    @jax.jit
    def gen_corpus_t(key):
        x = jax.random.normal(key, (D, N), jnp.bfloat16)
        nrm2 = jnp.einsum("dn,dn->n", x, x, preferred_element_type=jnp.float32)
        return x * jax.lax.rsqrt(nrm2 + 1e-12)[None, :].astype(jnp.bfloat16)

    # Tunnel canary with retries before committing to the big corpus gen —
    # a degraded window is better spent sleeping than hanging mid-transfer.
    for attempt in range(4):
        try:
            assert float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))) > 0
            break
        except Exception as e:
            print(f"# canary attempt {attempt + 1} failed: {e}", file=sys.stderr)
            time.sleep(15)

    ct = gen_corpus_t(jax.random.PRNGKey(0))
    # Corpus tensors are explicit jit ARGUMENTS of `run` — closing over them
    # would bake them into the HLO as 768MB+ constants shipped to the remote
    # compiler, which hangs the tunnel (the round-1 BENCH zero: the same
    # kernel compiles in ~2s when the corpus is an argument).
    if DTYPE == "int8":
        corpus, scales = quantize_corpus_t(ct)
        operands = (corpus, scales)
        inner = lambda q, c, s: cosine_topk_fused_int8(
            q, c, s, K, n_valid=N, block_n=BLOCK_N, block_q=BLOCK_Q
        )
    else:
        corpus = ct.astype(jnp.float32) if DTYPE == "f32" else ct
        precision = "exact" if DTYPE == "f32" else "fast"
        operands = (corpus,)
        inner = lambda q, c: cosine_topk_fused(
            q, c, K, n_valid=N, precision=precision, block_n=BLOCK_N, block_q=BLOCK_Q
        )
    np.asarray(corpus[0, 0])  # settle transfers

    keys = jax.random.split(jax.random.PRNGKey(1), REPS)
    qs = jax.vmap(lambda k: jax.random.normal(k, (Q, D)))(keys)
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)

    from ragfin_tpu.ops.topk import cosine_topk_dense

    def make_run(fn):
        @jax.jit
        def run(qs, *corpus_args):
            def step(carry, q):
                s, i = fn(q, *corpus_args)
                return carry + s[0, 0] + i[0, 0].astype(jnp.float32), None
            acc, _ = jax.lax.scan(step, 0.0, qs)
            return acc
        return run

    # The axon tunnel compiles remotely and can drop connections; retry the
    # fused kernel a few times, then fall back to the dense XLA path so the
    # bench always reports a number — TAGGED as a fallback so a degraded-
    # tunnel run can never masquerade as the fused kernel's QPS.
    run = make_run(inner)
    run_operands = operands
    tier = DTYPE
    for attempt in range(3):
        try:
            np.asarray(run(qs, *run_operands))  # compile + warm
            break
        except Exception as e:
            print(f"# warmup attempt {attempt + 1} failed: {e}", file=sys.stderr)
            time.sleep(20)
    else:
        dense_corpus = corpus if DTYPE != "int8" else ct
        run = make_run(
            lambda q, c: cosine_topk_dense(q, c, K, n_valid=N, precision="fast")
        )
        run_operands = (dense_corpus,)
        tier = f"{DTYPE}_dense_fallback"
        np.asarray(run(qs, *run_operands))

    t0 = time.perf_counter()
    np.asarray(run(qs, *run_operands))
    per_batch = (time.perf_counter() - t0) / REPS
    qps = Q / per_batch

    baseline = cpu_baseline_qps()
    scale_tag = f"{N // 1_000_000}M" if N >= 1_000_000 else f"{N // 1000}k"
    _print_result(
        {
            "metric": f"exact_cosine_top{K}_qps_{scale_tag}_chunks_{tier}",
            "value": round(qps, 1),
            "unit": "QPS",
            "vs_baseline": round(qps / baseline, 1),
        }
    )


def _main_with_watchdog() -> None:
    """The axon tunnel in this image compiles remotely and sometimes hangs
    for hours; a hung bench records nothing. Run the bench in a worker
    thread and, on timeout, emit an explicit failure line (value 0) so the
    infra outage is recorded rather than silently losing the round."""
    timeout_s = float(os.environ.get("BENCH_TIMEOUT", 480))
    done = threading.Event()

    def worker():
        try:
            main()
        except Exception as e:
            print(f"# bench failed: {e}", file=sys.stderr)
            _print_result(
                {
                    "metric": f"exact_cosine_top{K}_qps_bench_error_{DTYPE}",
                    "value": 0,
                    "unit": "QPS",
                    "vs_baseline": 0,
                }
            )
        finally:
            done.set()

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print("# bench timed out (TPU tunnel unresponsive)", file=sys.stderr)
        _print_result(
            {
                "metric": f"exact_cosine_top{K}_qps_tunnel_timeout_{DTYPE}",
                "value": 0,
                "unit": "QPS",
                "vs_baseline": 0,
            }
        )
        os._exit(2)


if __name__ == "__main__":
    _main_with_watchdog()
