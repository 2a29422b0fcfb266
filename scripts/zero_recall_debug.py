"""Reproduce + diagnose the one residual zero-recall query in the defended
full-scale tamper arm (qa_k10_inscope_tamper: recall 0.975@10, zero=1 at
1M out-of-scope + 20k in-scope forgeries; ROUND3_STATUS known-gap #2).

Rebuilds the EXACT eval index (same seeds as scripts/distractor_eval.py),
runs the defended pipeline per question, and for any question with
recall@10 == 0 dumps: the tier plan, gold ids vs retrieved ids, gold rank in
an oversized candidate list, and the integrity multipliers of the winners.

Usage: python scripts/zero_recall_debug.py   (CPU only)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

N = int(os.environ.get("DISTRACTOR_N", 1_000_000))
INSCOPE_N = int(os.environ.get("INSCOPE_N", 20_000))
REF = os.environ.get("REFERENCE_ROOT", "/root/reference")


def main() -> None:
    from ragfin_tpu.data.loader import build_corpus
    from ragfin_tpu.eval.datasets import load_qa_subset
    from ragfin_tpu.eval.distractors import generate_distractors, generate_inscope_distractors
    from ragfin_tpu.index.vector_index import DeviceVectorIndex
    from ragfin_tpu.retrieval.queryfilter import FilteredSearch

    t0 = time.perf_counter()
    real = build_corpus(os.path.join(REF, "extract_data"))
    dis = generate_distractors(N, seed=1)
    ins = generate_inscope_distractors(real, INSCOPE_N, seed=11, tiers=("reword", "dupe"))
    idx = DeviceVectorIndex.build(list(real) + dis + ins)
    print(f"[{time.perf_counter()-t0:7.1f}s] index: {len(idx):,} chunks", flush=True)
    qa = load_qa_subset(os.path.join(REF, "qa_subset.json"))
    fs = FilteredSearch(idx, consistency_weight=0.95)

    report = []
    for q in qa:
        hits = fs.search_texts([q.question], top_k=10)[0]
        got = [h.record.id for h in hits]
        gold = set(q.expected_chunks)
        rec = len(gold & set(got)) / max(1, len(gold))
        line = {"question": q.question, "recall@10": rec, "gold": sorted(gold), "got": got}
        if rec == 0.0:
            known_periods, companies, by_company = fs._vocab()
            line["tier_plan"] = fs._tier_groups(q.question, known_periods, companies, by_company)
            # Oversized defended + undefended candidate lists: where is gold?
            big = fs.search_texts([q.question], top_k=64)[0]
            line["gold_rank_defended@64"] = {
                g: next((r for r, h in enumerate(big) if h.record.id == g), None)
                for g in gold
            }
            undef = FilteredSearch(idx).search_texts([q.question], top_k=64)[0]
            line["gold_rank_undefended@64"] = {
                g: next((r for r, h in enumerate(undef) if h.record.id == g), None)
                for g in gold
            }
            line["top10_detail"] = [
                {"id": h.record.id, "score": float(h.score),
                 "type": getattr(h.record, "chunk_type", None),
                 "period": getattr(h.record, "period", None),
                 "text_head": h.record.text[:110]}
                for h in hits
            ]
            # Integrity multipliers of gold vs winners.
            from ragfin_tpu.retrieval.consistency import consistency_multiplier
            recs = {r.id: r for r in idx.records}
            line["integrity"] = {
                i: float(consistency_multiplier(recs[i].text, 0.95))
                for i in list(gold) + got
                if i in recs
            }
        report.append(line)
        print(f"recall={rec:.2f} {q.question[:70]}", flush=True)

    zeros = [r for r in report if r["recall@10"] == 0.0]
    os.makedirs("eval_results", exist_ok=True)
    with open("eval_results/zero_recall_debug.json", "w") as f:
        json.dump({"n_zero": len(zeros), "zeros": zeros}, f, indent=2)
    print(f"{len(zeros)} zero-recall queries; detail in eval_results/zero_recall_debug.json")


if __name__ == "__main__":
    main()
