"""Deep trace of the residual zero-recall query at full 1M+20k scale.

Rebuilds the exact tamper-arm index, then manually walks the failing
query's winning tier: bucket rows, raw sparse scores BEFORE the integrity
multiplier, the multiplier values, and the postings weights of gold vs the
winning dupes. Dumps eval_results/zero_recall_trace.json.

Usage: python scripts/zero_recall_trace.py   (CPU only)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

N = int(os.environ.get("DISTRACTOR_N", 1_000_000))
INSCOPE_N = int(os.environ.get("INSCOPE_N", 20_000))
REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
QUESTION = "What was the basic EPS in Q1 FY2024?"
GOLD = "icici_q1_fy2024_key_ratios"


def main() -> None:
    from ragfin_tpu.data.loader import build_corpus
    from ragfin_tpu.eval.distractors import generate_distractors, generate_inscope_distractors
    from ragfin_tpu.index.vector_index import DeviceVectorIndex
    from ragfin_tpu.retrieval.queryfilter import FilteredSearch

    t0 = time.perf_counter()
    real = build_corpus(os.path.join(REF, "extract_data"))
    dis = generate_distractors(N, seed=1)
    ins = generate_inscope_distractors(real, INSCOPE_N, seed=11, tiers=("reword", "dupe"))
    idx = DeviceVectorIndex.build(list(real) + dis + ins)
    print(f"[{time.perf_counter()-t0:7.1f}s] index: {len(idx):,} chunks", flush=True)
    fs = FilteredSearch(idx, consistency_weight=0.95)

    known_periods, companies, by_company = fs._vocab()
    groups = fs._tier_groups(QUESTION, known_periods, companies, by_company)
    report = {"tier_plan": groups}

    by_id = {r.id: i for i, r in enumerate(idx.records)}
    gold_row = by_id[GOLD]
    report["gold_row"] = gold_row

    queries = idx._expand_for_search([QUESTION], True)
    report["expanded_query"] = queries[0]

    tiers = []
    for flt in groups[0]:
        mask = idx._filter_mask(
            flt.get("period"), flt.get("chunk_type"), None,
            periods=flt.get("periods"), company=flt.get("company"),
        )
        plan = idx._exact_bucket_plan(
            mask, 0.95, flt.get("periods"), flt.get("period"),
            flt.get("chunk_type"), flt.get("company"),
        )
        tinfo = {
            "filter": flt,
            "bucket_size": int(mask.sum()) if mask is not None else None,
            "exact_path": plan is not None,
            "gold_in_bucket": bool(mask[gold_row]) if mask is not None else None,
        }
        if plan is not None:
            rows_arr, key = plan
            # Raw sparse scores BEFORE the multiplier.
            rows2, lookup, flat_w, doc_idx = idx._bucket_postings(rows_arr, key)
            qids, qwts = idx.featurizer.encode_batch(list(queries))
            qn = np.linalg.norm(qwts, axis=1, keepdims=True)
            qwts = qwts / np.maximum(qn, 1e-12)
            raw = np.zeros(len(rows2), np.float32)
            for fid, w in zip(qids[0], qwts[0]):
                if not w:
                    continue
                se = lookup.get(int(fid))
                if se is None:
                    continue
                s, e = se
                np.add.at(raw, doc_idx[s:e], flat_w[s:e] * np.float32(w))
            from ragfin_tpu.retrieval.consistency import strictify

            col = idx.integrity_column()[rows2]
            mult = strictify(col, 0.95).astype(np.float32)
            weighted = np.where(raw > 0, raw * mult, raw)
            order = np.lexsort((rows2, -weighted))
            pos_of = {int(rows2[li]): rank for rank, li in enumerate(order)}
            gi = int(np.nonzero(rows2 == gold_row)[0][0]) if gold_row in set(rows2.tolist()) else None
            tinfo["rows_identical_to_plan"] = bool(np.array_equal(rows2, rows_arr))
            if gi is not None:
                tinfo["gold"] = {
                    "bucket_pos": gi,
                    "raw_score": float(raw[gi]),
                    "integrity_ratio": float(col[gi]),
                    "mult": float(mult[gi]),
                    "weighted": float(weighted[gi]),
                    "final_rank": pos_of.get(gold_row),
                }
            top = [
                {
                    "row": int(rows2[li]),
                    "id": idx.records[int(rows2[li])].id,
                    "raw": float(raw[li]),
                    "ratio": float(col[li]),
                    "mult": float(mult[li]),
                    "weighted": float(weighted[li]),
                }
                for li in order[:8]
            ]
            tinfo["top8"] = top
            # Postings weights for gold vs the first winner: which query
            # features hit each, with what doc-side weights?
            win_li = int(order[0])
            per_feat = []
            for fid, w in zip(qids[0], qwts[0]):
                if not w:
                    continue
                se = lookup.get(int(fid))
                if se is None:
                    continue
                s, e = se
                seg = doc_idx[s:e]
                gw = float(flat_w[s:e][seg == gi].sum()) if gi is not None else None
                ww = float(flat_w[s:e][seg == win_li].sum())
                per_feat.append({"fid": int(fid), "qw": float(w), "gold_w": gw, "win_w": ww})
            tinfo["per_feature"] = per_feat
        tiers.append(tinfo)
    report["tiers"] = tiers

    os.makedirs("eval_results", exist_ok=True)
    with open("eval_results/zero_recall_trace.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "tiers"}, indent=1))
    for t in tiers:
        print(json.dumps({k: v for k, v in t.items() if k != "per_feature"}, indent=1)[:2000])
    print("wrote eval_results/zero_recall_trace.json")


if __name__ == "__main__":
    main()
