"""Concurrent-load serving benchmark (round-3 verdict #6).

Drives the FULL RPC stack — REST adapter (:9001-style JsonApp) → hand-rolled
MCP client → vector MCP server → VectorRAG → QueryBatcher → one batched
device dispatch — with C parallel HTTP clients against a SERVE_N-distractor
corpus, and reports:

- sustained QPS (completed requests / wall) + client-observed p50/p95;
- the batcher's batch-size distribution over the run (the proof that
  dynamic micro-batching actually forms Q>1 device batches under load —
  METRICS ``batcher.batch_size`` histogram, round-3 verdict: "does the
  batcher actually aggregate, and what QPS does one chip sustain then?");
- device dispatch count vs request count (the amortization ratio).

Single-stream p50 (scripts/serving_probe.py) answers "how long does one
caller wait"; this answers "what does one chip sustain". Everything runs
in-process (servers on background threads) so the batcher's METRICS are
directly readable; clients still cross real HTTP + MCP-SSE hops.

Usage: [SERVE_N=1000000] [CLIENTS=8,32] [DURATION=45] python scripts/serving_concurrent.py
Appends one line per client level to scripts/probe_results.log.

SERVE_DTYPE accepts a comma list ("bfloat16,int8") for the round-4 verdict
#6 back-to-back mode: both index tiers are built up front and each client
level alternates dtype within ONE process/tunnel window, so window variance
cancels out of the int8-vs-bf16 comparison.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("SERVE_N", 1_000_000))
CLIENTS = [int(c) for c in os.environ.get("CLIENTS", "8,32").split(",")]
DURATION = float(os.environ.get("DURATION", 45))
DTYPE = os.environ.get("SERVE_DTYPE", "bfloat16")
REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_results.log")


def _stage(msg: str) -> None:
    print(f"[conc {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    from ragfin_tpu.cli import _pin_platform_from_env

    _pin_platform_from_env()  # JAX_PLATFORMS=cpu smoke runs must not touch the tunnel

    import httpx
    import jax

    from ragfin_tpu.data.loader import build_corpus
    from ragfin_tpu.eval.datasets import load_qa_subset
    from ragfin_tpu.eval.distractors import generate_distractors, paraphrased_questions
    from ragfin_tpu.serving.engine import RagFinEngine
    from ragfin_tpu.serving.main import launch
    from ragfin_tpu.utils.profiling import METRICS

    _stage(f"backend={jax.default_backend()}; building {N}-distractor corpus")
    real = build_corpus(os.path.join(REF, "extract_data"))
    chunks = list(real) + generate_distractors(N, seed=1)
    os.environ.setdefault("RAGFIN_BATCH_QUERIES", "1")
    backend = os.environ.get("SERVE_BACKEND", "hashed")

    def build_stack(dtype: str):
        t0 = time.perf_counter()
        os.environ["RAGFIN_INDEX_DTYPE"] = dtype
        prebuilt = None
        if backend == "trained":
            # Production-default backend: reuse scripts/trained_eval.py's slab
            # cache (identical corpus: same distractor seed/order), so the 1M
            # encode is free when the trained eval already ran this checkpoint.
            from ragfin_tpu.index.vector_index import DeviceVectorIndex
            from ragfin_tpu.models.embedder import TrainedEmbedder

            os.environ["DISTRACTOR_N"] = str(N)  # slab dir must match this corpus
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            import trained_eval as te

            assert te.N == N, f"slab cache is for N={te.N}, this run is N={N}"
            import jax.numpy as jnp

            embedder = TrainedEmbedder(batch_size=512, pad_multiple=192)
            matrix = te.encode_corpus(embedder, [c.text for c in chunks], t0=time.perf_counter())
            jdtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "int8": jnp.int8}[dtype]
            prebuilt = DeviceVectorIndex(matrix, chunks, dtype=jdtype)
            prebuilt.embedder = TrainedEmbedder()  # query-shape pad_multiple=16
        else:
            # Measure the RPC/batcher stack with the weight-free lexical
            # featurizer (same backend as every serving_e2e line).
            os.environ.setdefault("RAGFIN_EMBED_BACKEND", "hashed")
        engine = RagFinEngine(chunks=chunks, vector_index=prebuilt)
        assert engine.batcher is not None, "batcher must be on for this benchmark"
        _stage(f"[{dtype}] engine up in {time.perf_counter()-t0:.0f}s; launching servers")
        servers = launch(
            services=("vector_mcp", "vector_adapter"),
            ports={"vector_mcp": 0, "vector_adapter": 0},
            engine=engine,
        )
        return engine, servers, f"http://127.0.0.1:{servers['vector_adapter'].port}/search"

    qa = load_qa_subset(os.path.join(REF, "qa_subset.json"))
    questions = [q.question for q in qa] + [q.question for q in paraphrased_questions(qa)]

    dtypes = [d.strip() for d in DTYPE.split(",") if d.strip()]
    stacks = {}
    for d in dtypes:
        engine, servers, url = build_stack(d)
        stacks[d] = (engine, servers, url)
        # Warm serially: compile every filter-shape combination once.
        _stage(f"[{d}] warming {len(questions)} question shapes through the adapter")
        t0 = time.perf_counter()
        with httpx.Client(timeout=600) as c:
            for q in questions:
                r = c.post(url, json={"query": q, "top_k": 3})
                r.raise_for_status()
        _stage(f"[{d}] warm pass {time.perf_counter()-t0:.1f}s")

    for n_clients, dtype in [(c, d) for c in CLIENTS for d in dtypes]:
        engine, servers, url = stacks[dtype]
        # Per-level stats from a clean slate (batch-size histogram included):
        # nothing is in flight between levels, so a reset is safe.
        METRICS.reset()
        stop_at = time.perf_counter() + DURATION
        lat: list[list[float]] = [[] for _ in range(n_clients)]
        errors = [0] * n_clients
        first_error: list = [None]

        def client(i: int) -> None:
            with httpx.Client(timeout=120) as c:
                j = i  # stagger round-robin starting points
                while time.perf_counter() < stop_at:
                    q = questions[j % len(questions)]
                    j += n_clients
                    t = time.perf_counter()
                    try:
                        r = c.post(url, json={"query": q, "top_k": 3})
                        r.raise_for_status()
                        body = r.json()
                        if not body.get("success") or not body.get("results"):
                            raise ValueError(f"bad body: {str(body)[:80]}")
                        lat[i].append(time.perf_counter() - t)
                    except Exception as e:
                        errors[i] += 1
                        if first_error[0] is None:
                            first_error[0] = repr(e)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

        after = METRICS.summary()
        batches = after.get("counters", {}).get("batcher.batches", 0)
        served = after.get("counters", {}).get("batcher.queries", 0)
        bhist = after.get("values", {}).get("batcher.batch_size", {})
        done = int(sum(len(l) for l in lat))
        if not done:
            raise RuntimeError(
                f"C={n_clients}: every request failed "
                f"({sum(errors)} errors; first: {first_error[0]})"
            )
        if first_error[0]:
            _stage(f"C={n_clients}: {sum(errors)} errors; first: {first_error[0]}")
        all_lat = np.sort(np.concatenate([np.array(l) for l in lat if l])) * 1e3
        qps = done / wall
        mean_batch = served / batches if batches else 0.0
        tag = "" if backend == "hashed" else f" backend={backend}"
        if dtype != "bfloat16" or len(dtypes) > 1:
            tag += f" dtype={dtype}"
        if len(dtypes) > 1:
            tag += " [back-to-back]"
        line = (
            f"serving_concurrent N={N} C={n_clients}{tag}: {qps:,.1f} QPS sustained "
            f"p50={all_lat[len(all_lat)//2]:.0f} ms p95={all_lat[int(len(all_lat)*0.95)]:.0f} ms "
            f"({done} reqs/{wall:.0f}s, errors={sum(errors)}; batcher: {batches} dispatches "
            f"batch mean={mean_batch:.1f} p50={bhist.get('p50', 0):.0f} "
            f"p90={bhist.get('p90', 0):.0f})"
        )
        with open(LOG, "a") as f:
            f.write(line + "\n")
        print(line)

    for engine, servers, _ in stacks.values():
        for s in servers.values():
            s.stop()
        engine.close()


if __name__ == "__main__":
    main()
