"""Million-scale distractor evaluation (round-1 verdict #3, "Done" gate).

Builds an index over the 16 real ICICI chunks + N synthetic hard negatives
(eval/distractors.py), runs qa_subset + paraphrases at k=3/k=10 through the
production pipeline (FilteredSearch) and the raw-embedding ablation, and
writes eval_results/distractor_eval_{N}.json.

Usage: [DISTRACTOR_N=1000000] python scripts/distractor_eval.py
Runs entirely on CPU (never touches the TPU tunnel).

ARMS=base,graph,ivf,tamper,fabrication,scaled,sparse (comma list; default
"all") selects arm groups — at 10M each in-scope group rebuilds a full-size
index, so running groups in SEPARATE processes bounds peak memory and makes
the battery resumable; results merge into the existing artifact.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

N = int(os.environ.get("DISTRACTOR_N", 1_000_000))
# Round-2 verdict Weak #1: out-of-scope distractors can never enter an
# FY2024 question's candidate set (the company ∧ period masks remove them
# before scoring), so the arms above measure the filter parser. The
# IN-SCOPE arms add ICICI-FY2024 perturbed negatives that survive every
# mask and force the embedder to discriminate.
INSCOPE_N = int(os.environ.get("INSCOPE_N", 20_000))
REF = os.environ.get("REFERENCE_ROOT", "/root/reference")


def _ivf_agreement(idx, qa, out):
    """IVF (cluster-pruned approximate) arm: overlap between IVF top-10 and
    the EXACT top-10 in the same embedding space — this isolates the
    cluster-pruning loss (recall-vs-labels belongs to the production
    pipeline arms; the raw embedding space is ambiguous by construction,
    see the raw_embedding ablation). Disable with DISTRACTOR_IVF=0."""
    if os.environ.get("DISTRACTOR_IVF", "1") != "1" or len(idx) < 4096:
        return
    import numpy as np

    from ragfin_tpu.index.ivf_index import IVFVectorIndex

    t = time.perf_counter()
    ivf = IVFVectorIndex.from_dense(idx, cell=2048, iters=3)
    n_cells = ivf.ivf.n_cells
    build_s = time.perf_counter() - t
    questions = [q.question for q in qa]
    exact = idx.search_texts(questions, top_k=10)
    curve = {}
    for nprobe in sorted({max(2, n_cells // 8), max(2, n_cells // 4), max(2, n_cells // 2), n_cells}):
        approx = ivf.search_texts(questions, top_k=10, nprobe=nprobe)
        overlaps = []
        for e_hits, a_hits in zip(exact, approx):
            e_ids = {h.id for h in e_hits}
            if e_ids:
                overlaps.append(len(e_ids & {h.id for h in a_hits}) / len(e_ids))
        curve[nprobe] = round(float(np.mean(overlaps)) if overlaps else 0.0, 4)
    out["results"]["ivf_vs_exact_overlap@10"] = {
        "agreement_by_nprobe": curve,
        "n_cells": n_cells,
        "build_s": round(build_s, 1),
    }
    print(
        f"[ivf] {n_cells} cells (built {build_s:.1f}s): top-10 agreement "
        f"with exact by nprobe = {curve}",
        flush=True,
    )


def main() -> None:
    from ragfin_tpu.data.loader import build_corpus
    from ragfin_tpu.eval.datasets import load_qa_subset, load_vector_eval
    from ragfin_tpu.eval.distractors import (
        generate_distractors,
        generate_inscope_distractors,
        paraphrased_questions,
    )
    from ragfin_tpu.eval.harness import evaluate_retrieval
    from ragfin_tpu.index.vector_index import DeviceVectorIndex
    from ragfin_tpu.retrieval.queryfilter import FilteredSearch

    t0 = time.perf_counter()
    real = build_corpus(os.path.join(REF, "extract_data"))
    dis = generate_distractors(N, seed=1)
    print(f"[{time.perf_counter()-t0:7.1f}s] generated {N:,} distractors", flush=True)
    idx = DeviceVectorIndex.build(list(real) + dis)
    print(f"[{time.perf_counter()-t0:7.1f}s] index built: {len(idx):,} chunks", flush=True)

    qa = load_qa_subset(os.path.join(REF, "qa_subset.json"))
    ve = load_vector_eval(os.path.join(REF, "vector_rag_evaluation_dataset.json"))
    from ragfin_tpu.eval.datasets import load_holdout_phrasings

    hp = load_holdout_phrasings()
    fs = FilteredSearch(idx)

    # Arm-group selection (10M memory/resume discipline — see module doc).
    arms = set(filter(None, os.environ.get("ARMS", "all").split(",")))

    def on(name: str) -> bool:
        return bool(arms & {"all", name})

    os.makedirs("eval_results", exist_ok=True)
    path = f"eval_results/distractor_eval_{N}.json"
    out = {"n_distractors": N, "n_chunks": len(idx), "results": {}}
    if os.path.exists(path) and arms != {"all"}:
        with open(path) as f:
            out["results"].update(json.load(f).get("results", {}))

    if on("base"):
        for name, questions, searcher, k in [
            ("qa_subset_k3", qa, fs, 3),
            ("qa_subset_k10", qa, fs, 10),
            ("paraphrases_k10", paraphrased_questions(qa), fs, 10),
            ("vector_eval_k10", ve, fs, 10),
            # Hand-written held-out phrasings (round-5 verdict #1):
            # colloquial / abbreviation / misspelled / compositional styles
            # the pair generators cannot emit.
            ("holdout_phrasings_k10", hp, fs, 10),
            ("holdout_phrasings_k3", hp, fs, 3),
            ("qa_subset_k10_raw_embedding", qa, idx, 10),
            ("holdout_phrasings_k10_raw_embedding", hp, idx, 10),
        ]:
            t = time.perf_counter()
            s = evaluate_retrieval(searcher, questions, k=k).summary()
            s["wall_s"] = round(time.perf_counter() - t, 2)
            out["results"][name] = s
            print(
                f"[{time.perf_counter()-t0:7.1f}s] {name}: recall={s['retrieval_recall']['mean']:.3f} "
                f"precision={s['retrieval_precision']['mean']:.3f} zero={s['zero_recall_queries']}",
                flush=True,
            )

        # Write the main results BEFORE the optional arms: a failure there
        # (e.g. k-means OOM at 1M) must not discard an hour of eval work.
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", path)

    # ---- GRAPH / HYBRID quality arms (round-4 verdict #5) ------------------
    # Same labeled questions through the 6-branch strategy dispatch, the
    # plan engine, and hybrid fusion (raw-vector leg = reference parity;
    # pipeline leg = what graph fusion adds on top of FilteredSearch). The
    # graph is built from the real records + 2,000 multi-company distractor
    # chunks as fact noise (company-scoped per record).
    if on("graph") and os.environ.get("GRAPH_ARMS", "1") == "1":
        from ragfin_tpu.eval.graph_arms import graph_hybrid_arms

        t = time.perf_counter()
        arms_out = graph_hybrid_arms(
            idx, real, qa, vector_searcher=fs, noise_chunks=dis[:2000]
        )
        for name, v in arms_out.items():
            if isinstance(v, dict) and "retrieval_recall" in v:
                v["wall_s"] = None
                print(
                    f"[{time.perf_counter()-t0:7.1f}s] {name}: "
                    f"recall={v['retrieval_recall']['mean']:.3f} "
                    f"precision={v['retrieval_precision']['mean']:.3f} "
                    f"zero={v['zero_recall_queries']}",
                    flush=True,
                )
        arms_out["wall_s"] = round(time.perf_counter() - t, 2)
        out["results"]["graph_hybrid_arms"] = arms_out
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", path, "(with graph/hybrid arms)")

    # ---- IN-SCOPE arms: negatives that survive every filter mask ----------
    # Tiers (eval/distractors.py): 'reword'/'dupe' = figure/wording TAMPERING
    # of the gold chunks — detectable via in-text arithmetic
    # (retrieval/consistency.py), so the defended pipeline
    # (consistency_weight=0.95) must hold recall near the clean ceiling.
    # 'regen' = internally-consistent FABRICATIONS — conflicting evidence
    # that no text-only retriever can resolve without provenance; reported
    # as the documented impossibility bound, not a headline.
    def run_arm(name, questions, searcher, k):
        t = time.perf_counter()
        s = evaluate_retrieval(searcher, questions, k=k).summary()
        s["wall_s"] = round(time.perf_counter() - t, 2)
        out["results"][name] = s
        print(
            f"[{time.perf_counter()-t0:7.1f}s] {name}: "
            f"recall={s['retrieval_recall']['mean']:.3f} "
            f"zero={s['zero_recall_queries']}",
            flush=True,
        )
        return s

    if INSCOPE_N:
        out["n_inscope"] = INSCOPE_N
        para = paraphrased_questions(qa)
        for tag, tiers in [("tamper", ("reword", "dupe")), ("fabrication", ("regen",))]:
            if not on(tag):
                continue
            ins = generate_inscope_distractors(real, INSCOPE_N, seed=11, tiers=tiers)
            idx_in = DeviceVectorIndex.build(list(real) + dis + ins)
            print(
                f"[{time.perf_counter()-t0:7.1f}s] {tag} index built: "
                f"{len(idx_in):,} chunks ({INSCOPE_N:,} in-scope {'/'.join(tiers)})",
                flush=True,
            )
            undefended = FilteredSearch(idx_in)
            defended = FilteredSearch(idx_in, consistency_weight=0.95)
            run_arm(f"qa_k10_inscope_{tag}_undefended", qa, undefended, 10)
            run_arm(f"qa_k3_inscope_{tag}", qa, defended, 3)
            run_arm(f"qa_k10_inscope_{tag}", qa, defended, 10)
            if tag == "tamper":
                run_arm(f"paraphrases_k10_inscope_{tag}", para, defended, 10)
            del idx_in, undefended, defended
            with open(path, "w") as f:
                json.dump(out, f, indent=2)
            print("wrote", path, f"(with in-scope {tag} arms)")
        out["results"]["inscope_notes"] = {
            "tamper": (
                "reword/dupe tiers perturb the gold chunks' figures (and "
                "wording); every perturbed copy survives the company/period/"
                "type masks. Defended arms use consistency_weight=0.95: "
                "in-text arithmetic (declared shares, named ratios, subset "
                "sums, EPS band) gates figure-tampered copies at both device "
                "candidate generation and final ranking "
                "(ragfin_tpu/retrieval/consistency.py)."
            ),
            "fabrication": (
                "regen tier fabricates internally-consistent ICICI-FY2024 "
                "statements with fresh random figures. These are conflicting "
                "evidence, not noise: without provenance/authority metadata "
                "NO text-only retriever (lexical or semantic) can identify "
                "the authentic chunk among N co-scoped self-consistent "
                "claims — expected recall decays toward chance with N. The "
                "production answer is source provenance, which IndexedChunk "
                "carries (id/company fields) but this adversary is allowed "
                "to forge."
            ),
        }
        with open(path, "w") as f:
            json.dump(out, f, indent=2)

    # ---- SCALED tamper arms (round-3 verdict #2): the smart forger --------
    # One per-chunk factor on every ₹ amount; all in-text arithmetic is
    # scale-invariant, so the single-document integrity defense is blind by
    # construction (consistency = 1.0 for every forgery — verified in
    # tests/test_conflict.py). What remains detectable is the cross-chunk
    # observable: contested scopes (conflict flags + abstention) always, and
    # continuity adjudication while authentic corroborators dominate.
    if INSCOPE_N and os.environ.get("SCALED_ARMS", "1") == "1" and (on("scaled") or on("sparse")):
        from ragfin_tpu.retrieval.conflict import (
            ContinuityAdjudicatedSearch,
            detect_conflicts,
        )

        def conflict_rate(searcher, questions, k=10, fetch=32):
            """{'top': fraction whose TOP hit sits in a contested scope (the
            abstention trigger — must be 0 on a clean corpus), 'any':
            fraction with ANY contested scope in the shortlist (includes
            genuinely-contradictory co-scoped distractor pairs — correct
            data-quality detection, not a false flag)}.

            Detection runs over a ``fetch``-wide shortlist — the production
            VectorRAG behavior (detection_fetch_k=32, round-4 verdict #4):
            at small k the forged and authentic members of one scope rarely
            co-occur in the returned slice, which is why the round-4 top-hit
            rate (detection confined to k=10) trailed any-scope by ~0.15."""
            cache: dict = {}
            flagged_any = flagged_top = 0
            for q in questions:
                hits = searcher.search_texts([q.question], top_k=max(k, fetch))[0]
                scopes = detect_conflicts(hits, cache=cache)
                contested = {k_ for k_, i in scopes.items() if i["conflict"]}
                if contested:
                    flagged_any += 1
                if hits:
                    r = hits[0].record
                    if (r.company, r.period, r.chunk_type) in contested:
                        flagged_top += 1
            n = max(len(questions), 1)
            return {"top": round(flagged_top / n, 4), "any": round(flagged_any / n, 4)}

        if on("scaled"):
            # False-flag gate on the CLEAN corpus first: flag rate must be 0.
            clean_rate = conflict_rate(fs, qa)
            out["results"]["conflict_flag_rate_clean"] = clean_rate
            print(f"[{time.perf_counter()-t0:7.1f}s] conflict flags (clean): {clean_rate}", flush=True)

            ins = generate_inscope_distractors(real, INSCOPE_N, seed=13, tiers=("scaled",))
            idx_sc = DeviceVectorIndex.build(list(real) + dis + ins)
            print(
                f"[{time.perf_counter()-t0:7.1f}s] scaled index built: {len(idx_sc):,}",
                flush=True,
            )
            undefended = FilteredSearch(idx_sc)
            integrity = FilteredSearch(idx_sc, consistency_weight=0.95)
            run_arm("qa_k10_inscope_scaled_undefended", qa, undefended, 10)
            run_arm("qa_k10_inscope_scaled_integrity", qa, integrity, 10)
            out["results"]["conflict_flag_rate_scaled"] = conflict_rate(undefended, qa)
            print(
                f"[{time.perf_counter()-t0:7.1f}s] conflict flags (scaled): "
                f"{out['results']['conflict_flag_rate_scaled']}",
                flush=True,
            )
            del idx_sc, undefended, integrity
            with open(path, "w") as f:
                json.dump(out, f, indent=2)

            # Fabrication conflict flags: regen forgeries are co-scoped
            # internally-consistent contradictions — ranking is impossible
            # (documented bound) but flagging is not.
            ins_fab = generate_inscope_distractors(real, min(INSCOPE_N, 2000), seed=17, tiers=("regen",))
            idx_fab = DeviceVectorIndex.build(list(real) + ins_fab)
            out["results"]["conflict_flag_rate_fabrication"] = conflict_rate(
                FilteredSearch(idx_fab), qa
            )
            print(
                f"[{time.perf_counter()-t0:7.1f}s] conflict flags (fabrication): "
                f"{out['results']['conflict_flag_rate_fabrication']}",
                flush=True,
            )
            del idx_fab

        if not on("sparse"):
            with open(path, "w") as f:
                json.dump(out, f, indent=2)
            print("wrote", path, "(scaled arms, sparse skipped)")
            sparse_enabled = False
        else:
            sparse_enabled = True

        # SPARSE adversary: 5 scaled forgeries per gold chunk, inserted
        # BEFORE the gold rows and with ids that sort before gold's — the
        # worst case for every tie-break an exact-duplicate attack hits
        # (device row order and sparse-rerank id order both favor the
        # forger here). Continuity adjudication is the defense with teeth
        # in this regime: authentic corroborators still dominate.
        if sparse_enabled:
            import numpy as np

            from ragfin_tpu.data.models import IndexedChunk
            from ragfin_tpu.eval.distractors import _scale_uniformly

            r = np.random.default_rng(23)
            forged = []
            for gi, g in enumerate(real):
                for c in range(5):
                    forged.append(
                        IndexedChunk(
                            id=f"aa_forged_{gi:02d}_{c}",
                            text=_scale_uniformly(g.text, r),
                            period=g.period,
                            chunk_type=g.chunk_type,
                            statement_type=g.statement_type,
                            primary_value=g.primary_value,
                            company=g.company,
                        )
                    )
            idx_sp = DeviceVectorIndex.build(forged + list(real) + dis)
            und = FilteredSearch(idx_sp)
            run_arm("qa_k10_sparse_scaled_undefended", qa, und, 10)
            run_arm(
                "qa_k10_sparse_scaled_continuity",
                qa,
                ContinuityAdjudicatedSearch(und, idx_sp),
                10,
            )
            out["results"]["sparse_scaled_notes"] = (
                "5 scale-consistent forgeries per gold chunk (80 total), worst-"
                "case insertion/id order so every exact-duplicate tie-break "
                "favors the forger. Undefended = tie-break collapse; continuity "
                "= best-effort cross-period adjudication "
                "(retrieval/conflict.py) — a measurable recall improvement, NOT "
                "recovery: scale-consistent forgeries are in-band "
                "unidentifiable (authentic QoQ drift ~0.07 median |log ratio| "
                "exceeds the flattest adversarial combo ~0.025; coherence "
                "selection picks forged sets 40/40 — "
                "scripts/scale_adjudication_probe.py). Scaling attacks "
                "therefore join fabrication under the impossibility bound; the "
                "production defense is conflict FLAGGING + abstention (rates "
                "above; VectorRAG answer_mode='conflict')."
            )
            del idx_sp, und
            with open(path, "w") as f:
                json.dump(out, f, indent=2)
            print("wrote", path, "(with scaled/conflict arms)")

    if not on("ivf"):
        return
    try:
        _ivf_agreement(idx, qa, out)
    except Exception as e:
        print(f"[ivf] agreement arm failed: {e}", flush=True)
    else:
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", path, "(with IVF agreement)")


if __name__ == "__main__":
    main()
