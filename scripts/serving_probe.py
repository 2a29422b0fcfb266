"""End-to-end serving latency on TPU: the PRODUCTION retrieval path
(FilteredSearch: filter extraction -> tiered scoped device searches ->
exact sparse rerank) over the 16 real chunks + SERVE_N synthetic hard
negatives, driven with the 40 qa_subset questions.

This is the number a serving deployment sees per query — host featurize +
device dispatches + host rerank, wall-clock per question (dispatch and
tunnel round-trips included, unlike the amortized kernel probes).

Usage: [SERVE_N=1000000] python scripts/serving_probe.py
Appends one line to scripts/probe_results.log.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("SERVE_N", 1_000_000))
DTYPE = os.environ.get("SERVE_DTYPE", "bfloat16")
REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_results.log")


def _stage(msg: str) -> None:
    print(f"[serve {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    import jax

    from ragfin_tpu.data.loader import build_corpus
    from ragfin_tpu.eval.datasets import load_qa_subset
    from ragfin_tpu.eval.distractors import generate_distractors
    from ragfin_tpu.index.vector_index import DeviceVectorIndex
    from ragfin_tpu.retrieval.queryfilter import FilteredSearch

    _stage(f"backend={jax.default_backend()}; generating {N} distractors")
    real = build_corpus(os.path.join(REF, "extract_data"))
    chunks = list(real) + generate_distractors(N, seed=1)
    _stage("featurizing + building index")
    t0 = time.perf_counter()
    index = DeviceVectorIndex.build(chunks, dtype=DTYPE, batch_size=8192)
    build_s = time.perf_counter() - t0
    _stage(f"index built in {build_s:.1f}s; warming query shapes")

    fs = FilteredSearch(index)
    qa = load_qa_subset(os.path.join(REF, "qa_subset.json"))
    questions = [q.question for q in qa]
    # Warm: every question once (compiles each filter-shape combination).
    t0 = time.perf_counter()
    for q in questions:
        fs.search_texts([q], top_k=3)
    warm_s = time.perf_counter() - t0
    _stage(f"warm pass {warm_s:.1f}s; timing")

    lat = []
    for q in questions:
        t0 = time.perf_counter()
        hits = fs.search_texts([q], top_k=3)[0]
        lat.append(time.perf_counter() - t0)
        if not hits:
            raise RuntimeError(f"no hits for question: {q!r}")
    lat_ms = np.sort(np.array(lat)) * 1e3
    p50, p95 = lat_ms[len(lat_ms) // 2], lat_ms[int(len(lat_ms) * 0.95)]
    line = (
        f"serving_e2e N={N} {DTYPE}: p50={p50:.1f} ms p95={p95:.1f} ms "
        f"({1000.0 / p50:,.0f} QPS single-stream, build={build_s:.0f}s)"
    )
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
