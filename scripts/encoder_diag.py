"""Quick CPU diagnostic of the trained domain encoder's query tower.

Measures, on the 16 real chunks (+ optionally K in-scope forgeries):

- gold-wins: fraction of qa_subset questions whose nearest real chunk is a
  labeled-relevant one (pure cosine, no filters/expansion);
- gold margin: mean (top-gold sim) − (best non-gold sim);
- doc-tower scope separation: same-scope reworded-dupe sim vs
  cross-scope sim.

Round-4 context: at 1M the pipeline arms hit the clean ceiling but the RAW
encoder arms were weak (qa 0.10@10); the bottleneck localized to the query
tower (gold-wins 45% on the 16-chunk corpus — confusion among REAL ICICI
chunks, not bank ambiguity). This script is the fast train-eval loop for
encoder iterations: seconds on CPU, no tunnel.

Usage: [CKPT=checkpoints/domain_encoder] python scripts/encoder_diag.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    from ragfin_tpu.data.loader import build_corpus
    from ragfin_tpu.eval.datasets import load_qa_subset
    from ragfin_tpu.models.embedder import TrainedEmbedder

    ref = os.environ.get("REFERENCE_ROOT", "/root/reference")
    embedder = TrainedEmbedder(checkpoint=os.environ.get("CKPT"))
    chunks = build_corpus(os.path.join(ref, "extract_data"))
    qa = load_qa_subset(os.path.join(ref, "qa_subset.json"))

    docs = np.asarray(embedder.encode_texts([c.text for c in chunks]))
    ids = [c.id for c in chunks]

    def tower_stats(questions, label):
        queries = np.asarray(embedder.encode_texts([q.question for q in questions]))
        sims = queries @ docs.T  # encoders L2-normalize
        wins, margins, ranks = 0, [], []
        for qi, q in enumerate(questions):
            gold = {g for g in q.expected_chunks}
            gold_idx = [i for i, cid in enumerate(ids) if cid in gold]
            if not gold_idx:
                continue
            row = sims[qi]
            best_gold = max(float(row[i]) for i in gold_idx)
            non_gold = [float(row[i]) for i in range(len(ids)) if i not in gold_idx]
            margin = best_gold - max(non_gold)
            margins.append(margin)
            wins += margin > 0
            ranks.append(1 + sum(s > best_gold for s in non_gold))
        n = len(margins)
        print(
            f"{label}: gold-wins {wins}/{n} = {wins/n:.2f}  margin mean {np.mean(margins):+.4f} "
            f"p10 {np.percentile(margins, 10):+.4f}  mean gold rank {np.mean(ranks):.2f}"
        )
        return wins / n

    tower_stats(qa, "qa_subset     ")
    # Hand-written held-out phrasings (round-5 gate): the raw query tower on
    # styles the pair generators cannot emit.
    from ragfin_tpu.eval.datasets import load_holdout_phrasings

    tower_stats(load_holdout_phrasings(), "holdout(hand) ")

    # Fragment arm (v4 KNOWN RESIDUAL / v5 target): scope-token-less metric
    # fragments ("net profit", "cost to income ratio"). Gold = every chunk
    # of the fragment's statement type — with no scope token any quarter's
    # chunk of the right type is a win; landing on another type is the
    # failure this arm measures.
    from types import SimpleNamespace

    from ragfin_tpu.models.pairgen import fragment_queries

    by_type: dict[str, list[str]] = {}
    for c in chunks:
        by_type.setdefault(c.chunk_type, []).append(c.id)
    frags = [
        SimpleNamespace(question=q, expected_chunks=by_type[ct])
        for q, ct in fragment_queries()
    ]
    tower_stats(frags, "fragments     ")

    # Doc-tower separation: reworded same-scope dupe vs a cross-scope chunk.
    from ragfin_tpu.eval.distractors import _reword  # same machinery as training

    r = np.random.default_rng(0)
    dupes = np.asarray(embedder.encode_texts([_reword(c.text, r) for c in chunks]))
    same = float(np.mean(np.sum(docs * dupes, axis=1)))
    off = docs @ docs.T
    np.fill_diagonal(off, np.nan)
    print(
        f"doc tower: same-scope dupe sim {same:.4f}  "
        f"cross-chunk sim {np.nanmean(off):.4f}"
    )
    meta = dict(embedder.meta)
    meta.pop("history_tail", None)
    print("meta:", json.dumps(meta))


if __name__ == "__main__":
    main()
