"""Million-scale eval of the TRAINED semantic backend (round-3 verdict #1).

Builds the same 16-real + N-distractor corpus as scripts/distractor_eval.py
but embeds it with the from-scratch in-domain encoder
(checkpoints/domain_encoder/) on the TPU, then measures:

- qa_subset / vector_eval recall through the production FilteredSearch
  (which performs NO query expansion for semantic backends — the synonyms
  lexicon is off this path by construction);
- the paraphrase arm (the encoder-generalization gate: >= 0.95 recall@10
  without query expansion is the "Done" criterion);
- RAW embedding arms: no filters, no expansion, no lexicon anywhere — the
  pure-encoder number at 1M distractors;
- IVF-vs-exact overlap on trained embeddings (clustered semantic space —
  re-judging IVF on a workload where pruning can win).

Encoding is resumable: embeddings persist to eval_results/ in 100k-chunk
float16 slabs; a killed tunnel window loses at most one slab.

Usage: [DISTRACTOR_N=1000000] python scripts/trained_eval.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("DISTRACTOR_N", 1_000_000))
SLAB = int(os.environ.get("SLAB", 100_000))
REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
OUT = f"eval_results/trained_eval_{N}.json"
EMB_DIR = f"eval_results/trained_emb_{N}"


def encode_corpus(embedder, texts, t0):
    """Resumable slab-wise encode: returns [N, 384] float32.

    The cache is keyed on the encoder checkpoint's fingerprint: slabs from
    a previous encoder version would otherwise be silently mixed with
    queries encoded by the NEW checkpoint (mismatched towers — wrong eval
    numbers attributed to the new encoder)."""
    import shutil

    import numpy as np

    os.makedirs(EMB_DIR, exist_ok=True)
    fingerprint = {
        k: embedder.meta.get(k) for k in ("steps", "final_loss", "wall_s", "seed")
    }
    marker = os.path.join(EMB_DIR, "encoder.json")
    stale = True
    if os.path.exists(marker):
        with open(marker) as f:
            stale = json.load(f) != fingerprint
    if stale:
        shutil.rmtree(EMB_DIR)
        os.makedirs(EMB_DIR)
        with open(marker, "w") as f:
            json.dump(fingerprint, f)
    encode_only = os.environ.get("ENCODE_ONLY") == "1"
    slabs = []
    for start in range(0, len(texts), SLAB):
        path = os.path.join(EMB_DIR, f"slab_{start:08d}.npy")
        stop = min(start + SLAB, len(texts))
        if os.path.exists(path):
            if encode_only:
                continue
            arr = np.load(path)
            if arr.shape[0] == stop - start:
                slabs.append(arr.astype(np.float32))
                continue
        t = time.perf_counter()
        emb = embedder.encode_texts(texts[start:stop])
        np.save(path, emb.astype(np.float16))
        if not encode_only:
            slabs.append(emb)
        rate = (stop - start) / (time.perf_counter() - t)
        print(
            f"[{time.perf_counter()-t0:7.1f}s] encoded {stop:,}/{len(texts):,} "
            f"({rate:,.0f} chunks/s)",
            flush=True,
        )
    if encode_only:
        return None  # ENCODE_ONLY=1: slabs on disk, nothing held in RAM
    return np.concatenate(slabs, axis=0)


def main() -> None:
    import numpy as np

    from ragfin_tpu.data.loader import build_corpus
    from ragfin_tpu.eval.datasets import load_qa_subset, load_vector_eval
    from ragfin_tpu.eval.distractors import generate_distractors, paraphrased_questions
    from ragfin_tpu.eval.harness import evaluate_retrieval
    from ragfin_tpu.index.vector_index import DeviceVectorIndex
    from ragfin_tpu.models.embedder import TrainedEmbedder
    from ragfin_tpu.retrieval.queryfilter import FilteredSearch
    from ragfin_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    t0 = time.perf_counter()
    embedder = TrainedEmbedder(batch_size=512, pad_multiple=192)
    print(f"[{time.perf_counter()-t0:7.1f}s] encoder loaded: {embedder.meta.get('steps')} steps, "
          f"vocab {embedder.tokenizer.vocab_size}", flush=True)

    real = build_corpus(os.path.join(REF, "extract_data"))
    dis = generate_distractors(N, seed=1)
    chunks = list(real) + dis
    print(f"[{time.perf_counter()-t0:7.1f}s] corpus: {len(chunks):,} chunks", flush=True)

    texts = [c.text for c in chunks]
    if os.environ.get("ENCODE_ONLY") == "1":
        # RAM-lean slab-fill pass (safe to run alongside the CPU eval
        # battery at 10M): drop the 10M chunk objects, keep only texts.
        del chunks, dis, real
        encode_corpus(embedder, texts, t0)
        print(f"[{time.perf_counter()-t0:7.1f}s] encode-only pass complete", flush=True)
        return
    matrix = encode_corpus(embedder, texts, t0)
    del texts
    # DTYPE=int8 is the 10M tier: an f32 [384, 10M] matrix is 15.4 GB and
    # does not fit 16 GB HBM next to workspace; int8 + host exact repair is
    # the production configuration at that scale (BENCH_NOTES 10M headline).
    import jax.numpy as jnp

    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}[
        os.environ.get("TRAINED_DTYPE", "f32")
    ]
    idx = DeviceVectorIndex(matrix, chunks, dtype=dtype)
    del matrix  # the index keeps its own (padded) rows; drop the extra 15 GB at 10M
    idx.embedder = embedder  # query encoding path
    print(
        f"[{time.perf_counter()-t0:7.1f}s] index built: {len(idx):,} (dtype {dtype.__name__})",
        flush=True,
    )

    qa = load_qa_subset(os.path.join(REF, "qa_subset.json"))
    ve = load_vector_eval(os.path.join(REF, "vector_rag_evaluation_dataset.json"))
    para = paraphrased_questions(qa)
    fs = FilteredSearch(idx)

    out = {
        "n_distractors": N,
        "n_chunks": len(idx),
        "backend": "trained",
        "encoder_meta": {k: embedder.meta.get(k) for k in ("steps", "final_loss", "platform")},
        "results": {},
    }

    def run_arm(name, questions, searcher, k):
        t = time.perf_counter()
        s = evaluate_retrieval(searcher, questions, k=k).summary()
        s["wall_s"] = round(time.perf_counter() - t, 2)
        out["results"][name] = s
        print(
            f"[{time.perf_counter()-t0:7.1f}s] {name}: "
            f"recall={s['retrieval_recall']['mean']:.3f} "
            f"precision={s['retrieval_precision']['mean']:.3f} "
            f"zero={s['zero_recall_queries']}",
            flush=True,
        )
        os.makedirs("eval_results", exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(out, f, indent=2)

    # ARMS=ivf (comma list) re-runs a subset against the slab cache without
    # paying for the full battery; results merge into the existing artifact.
    arms = set(filter(None, os.environ.get("ARMS", "all").split(",")))
    if os.path.exists(OUT) and arms != {"all"}:
        with open(OUT) as f:
            prev = json.load(f)
        out["results"].update(prev.get("results", {}))

    from ragfin_tpu.eval.datasets import load_holdout_phrasings

    hp = load_holdout_phrasings()
    if arms & {"all", "pipeline"}:
        run_arm("qa_subset_k3_trained", qa, fs, 3)
        run_arm("qa_subset_k10_trained", qa, fs, 10)
        run_arm("paraphrases_k10_trained", para, fs, 10)
        run_arm("vector_eval_k10_trained", ve, fs, 10)
        # Hand-written held-out phrasings (round-5 verdict #1, gate arm).
        run_arm("holdout_phrasings_k10_trained", hp, fs, 10)
        run_arm("holdout_phrasings_k3_trained", hp, fs, 3)
    if arms & {"all", "raw"}:
        run_arm("qa_subset_k10_raw_trained", qa, idx, 10)
        run_arm("paraphrases_k10_raw_trained", para, idx, 10)
        run_arm("holdout_phrasings_k10_raw_trained", hp, idx, 10)
    if arms & {"all", "graph"}:
        # Graph/hybrid quality arms on the trained backend (round-4 verdict
        # #5); graph facts from the real records + 2k multi-company noise.
        from ragfin_tpu.eval.graph_arms import graph_hybrid_arms

        t = time.perf_counter()
        ga = graph_hybrid_arms(idx, real, qa, vector_searcher=fs, noise_chunks=dis[:2000])
        ga["wall_s"] = round(time.perf_counter() - t, 2)
        out["results"]["graph_hybrid_arms_trained"] = ga
        for name, v in ga.items():
            if isinstance(v, dict) and "retrieval_recall" in v:
                print(
                    f"[{time.perf_counter()-t0:7.1f}s] {name}: "
                    f"recall={v['retrieval_recall']['mean']:.3f}",
                    flush=True,
                )
        with open(OUT, "w") as f:
            json.dump(out, f, indent=2)
    if not arms & {"all", "ivf"}:
        with open(OUT, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", OUT)
        return

    # IVF on clustered semantic embeddings (round-3 verdict: re-judge IVF
    # once embeddings actually cluster).
    try:
        from ragfin_tpu.index.ivf_index import IVFVectorIndex

        t = time.perf_counter()
        ivf = IVFVectorIndex.from_dense(idx, cell=2048, iters=3)
        n_cells = ivf.ivf.n_cells
        build_s = time.perf_counter() - t
        from ragfin_tpu.eval.harness import tie_aware_agreement

        questions = [q.question for q in qa]
        # The agreement reference is the HOST-exact oracle over the f32
        # shadow rows (score by one host sgemm, stable-descending lowest-id
        # tie-break — the same contract as _exact_rerank_host). Round-5
        # lesson: using the dense DEVICE tier as "exact" leaks ITS ~1-ulp
        # multipass-accumulation epsilon into the metric — inside the
        # 400-member bitwise-duplicate tie bands of trained embeddings that
        # epsilon flips boundary membership, so the repaired IVF tier
        # (host-exact by construction) scored 0.9925 against a reference
        # that was itself the wrong arm.
        WIDE = 128
        qv = np.asarray(embedder.encode_texts(questions), np.float32)
        S = ivf._exact_rows @ qv.T  # [N, Q] f32, one BLAS call
        exact_wide = []
        for qi in range(len(questions)):
            s = S[:, qi]
            part = np.argpartition(-s, min(WIDE * 4, len(s) - 1))[: WIDE * 4]
            order = part[np.lexsort((part, -s[part]))][:WIDE]
            exact_wide.append([(idx.records[i].id, float(s[i])) for i in order])
        del S
        # Exact-tier wall at the SAME k over the same questions (second call
        # so compiles are warm for both tiers) — the apples-to-apples point
        # for the IVF recall-vs-QPS verdict.
        t = time.perf_counter()
        idx.search_texts(questions, top_k=10)
        exact_wall = time.perf_counter() - t
        curve = {}
        for nprobe in sorted(
            {max(2, n_cells // 32), max(2, n_cells // 8), max(2, n_cells // 4), n_cells}
        ):
            ivf.search_texts(questions, top_k=10, nprobe=nprobe)  # warm compile
            t = time.perf_counter()
            approx = ivf.search_texts(questions, top_k=10, nprobe=nprobe)
            wall = time.perf_counter() - t
            overlap, tie_aware, trunc = tie_aware_agreement(
                exact_wide, [[h.id for h in hits] for hits in approx], k=10, wide=WIDE
            )
            curve[nprobe] = {
                "overlap": round(overlap, 4),
                "tie_aware": round(tie_aware, 4),
                "tie_truncated": trunc,
                "wall_s": round(wall, 2),
            }
        out["results"]["ivf_vs_exact_overlap@10_trained"] = {
            "agreement_by_nprobe": curve,
            "n_cells": n_cells,
            "build_s": round(build_s, 1),
            "exact_wall_s_k10": round(exact_wall, 2),
        }
        print(f"[{time.perf_counter()-t0:7.1f}s] ivf: {curve}", flush=True)
    except Exception as e:
        print(f"[ivf] failed: {e}", flush=True)

    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
