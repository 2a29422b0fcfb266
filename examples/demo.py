"""End-to-end offline demo: build → search → graph → hybrid → eval.

Non-interactive equivalent of the reference's smoke mains
(``retrieve.py:90-111`` five canned questions, ``graphretrieve.py:67-80``
four graph questions, ``chunking_storing (1).py:427-433`` three build-time
searches) — everything runs deterministic and offline (rule-based extraction,
extractive answers) on the device indexes.

    python examples/demo.py [--data /root/reference/extract_data]
"""

import argparse
import asyncio
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("RAGFIN_DEMO_TPU") != "1":
    # The 16-chunk demo gains nothing from the TPU and the axon tunnel is
    # single-client/unreliable (CLAUDE.md); the env-var route
    # (JAX_PLATFORMS=cpu) is ignored by the axon plugin, so pin via config.
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default="/root/reference/extract_data")
    args = parser.parse_args()

    from ragfin_tpu.data.loader import build_corpus
    from ragfin_tpu.eval.datasets import load_qa_subset
    from ragfin_tpu.eval.harness import evaluate_retrieval
    from ragfin_tpu.index.vector_index import DeviceVectorIndex
    from ragfin_tpu.retrieval.graph_rag import GraphBuilder
    from ragfin_tpu.retrieval.hybrid import HybridRAG
    from ragfin_tpu.retrieval.vector_rag import VectorRAG

    print("=== 1. chunk + build device index ===")
    chunks = build_corpus(args.data)
    index = DeviceVectorIndex.build(chunks)
    print(f"indexed {len(index)} chunks, dim={index.dim}")

    print("\n=== 2. vector search (reference retrieve.py test set) ===")
    rag = VectorRAG(index)
    for question in [
        "What was ICICI Bank's net profit in Q1 FY2024?",
        "What was the operating margin for Q2 FY2024?",
        "How did retail banking perform in Q3 FY2024?",
        "What was the EPS for Q4 FY2024?",
        "What were the total assets in Q3 FY2024?",
    ]:
        hits = rag.search(question, top_k=3)
        print(f"Q: {question}")
        print(f"   -> {hits[0]['id']}  (score {hits[0]['score']:.3f})")

    print("\n=== 3. knowledge graph build (rule-based, no LLM) ===")
    builder = GraphBuilder()
    result = builder.build_from_vector_index(index)
    print(f"processed {result['chunks_processed']} chunks, "
          f"{result['total_entities_created']} facts")
    print(json.dumps({k: v for k, v in builder.get_stats().items() if k.endswith('_count')}))

    print("\n=== 4. graph strategy search (reference graphretrieve.py set) ===")
    hybrid = HybridRAG(index, builder.graph)
    for question in [
        "How did ICICI's net profit change from Q1 to Q4 FY2024?",
        "Which business segment drove growth in Q3?",
        "How did treasury margins evolve across quarters?",
        "What was retail banking revenue in Q2?",
    ]:
        out = asyncio.run(hybrid.graph_search(question))
        print(f"Q: {question}")
        print(f"   strategy={out['strategy']}  results={len(out['results'])}")

    print("\n=== 5. hybrid retrieval ===")
    out = hybrid.hybrid_query_simple("How did ICICI's net profit change from Q1 to Q4 FY2024?")
    for c in out["chunks"][:5]:
        print(f"   [{c['source']}] {c['id']}  score={c['score']:.3f}")

    print("\n=== 6. recall@10 parity gate (qa_subset.json) ===")
    qa_path = "/root/reference/qa_subset.json"
    if os.path.exists(qa_path):
        report = evaluate_retrieval(index, load_qa_subset(qa_path), k=10)
        s = report.summary()
        print(f"recall@10 = {s['retrieval_recall']['mean']:.3f} "
              f"({s['perfect_retrievals']}/{s['questions_evaluated']} perfect)")
    else:
        print("qa_subset.json not mounted; skipped")


if __name__ == "__main__":
    main()
