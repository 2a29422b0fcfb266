"""Measured impossibility probe: can cross-chunk coherence identify the
authentic chunk among scale-consistent forgeries? (round-3 verdict #2)

Setup: for each chunk type, each of the 4 gold ICICI-FY2024 quarter chunks
gets 5 scale-consistent forgeries (every ₹ amount x one per-chunk factor
~U(0.7, 1.4); percentages untouched, so every in-text arithmetic check
passes at 1.0). Two candidate adjudicators:

1. per-member consensus displacement (|median per-label log-ratio| against
   other-period corroborators) — the continuity_score estimator;
2. joint coherent-quarter-set selection (min mean pairwise displacement
   over one-member-per-quarter combos) — the "cannot fake the whole
   quarter-set coherently" hypothesis.

Result (deterministic, seeds 0-9): BOTH FAIL SYSTEMATICALLY. Authentic
quarter-over-quarter drift has median |log ratio| ~= 0.05-0.10; among 6^4
combos the forger's random factors realize flatter (more "coherent") series
~= 0.01-0.04, so the minimum-displacement combo is essentially never
all-gold (0/40 measured). The observable equivalence class
{gold x factor} is unbreakable in-band: scaling attacks join fabrication
under the impossibility bound, and the production defense is conflict
detection + abstention (retrieval/conflict.py, measured flag rates in
eval_results/distractor_eval_*.json), not ranking.

Usage: python scripts/scale_adjudication_probe.py  (CPU, ~1 min)
"""

import itertools
import json
import math
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from ragfin_tpu.data.loader import build_corpus
from ragfin_tpu.eval.distractors import _scale_uniformly
from ragfin_tpu.retrieval.conflict import continuity_score, labeled_figures

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
COPIES = 5
SEEDS = range(10)
TYPES = [
    "profitability_analysis",
    "balance_sheet_analysis",
    "segment_analysis",
    "financial_ratios",
]


def pair_cost(fa, fb):
    logs = [
        math.log(fa[k] / fb[k]) for k in fa if k in fb and fa[k] > 0 and fb[k] > 0
    ]
    if len(logs) < 2:
        return None
    return abs(statistics.median(logs))


def main() -> None:
    real = build_corpus(os.path.join(REF, "extract_data"))
    joint_wins = member_wins = trials = member_trials = 0
    gold_drifts, best_costs = [], []
    for seed in SEEDS:
        r = np.random.default_rng(seed)
        for ctype in TYPES:
            chunks = [c for c in real if c.chunk_type == ctype]
            buckets = []
            for c in chunks:
                texts = [c.text] + [_scale_uniformly(c.text, r) for _ in range(COPIES)]
                buckets.append([labeled_figures(t) for t in texts])

            # 1. per-member consensus (gold-only corroborators = best case)
            for qi in range(len(chunks)):
                corroborators = [buckets[qj][0] for qj in range(len(chunks)) if qj != qi]
                scores = [
                    continuity_score(figs, corroborators) for figs in buckets[qi]
                ]
                valid = [s for s in scores if s is not None]
                if len(valid) == len(scores):
                    member_trials += 1
                    if scores[0] == min(scores):
                        member_wins += 1

            # 2. joint coherent-set selection
            best, best_cost, gold_cost = None, 1e9, None
            for combo in itertools.product(*[range(COPIES + 1)] * len(chunks)):
                costs = []
                for i, j in itertools.combinations(range(len(chunks)), 2):
                    pc = pair_cost(buckets[i][combo[i]], buckets[j][combo[j]])
                    if pc is not None:
                        costs.append(pc)
                n_pairs = len(chunks) * (len(chunks) - 1) // 2
                cost = sum(costs) / len(costs) if len(costs) == n_pairs else 1e9
                if combo == tuple([0] * len(chunks)):
                    gold_cost = cost
                if cost < best_cost:
                    best_cost, best = cost, combo
            trials += 1
            if best == tuple([0] * len(chunks)):
                joint_wins += 1
            gold_drifts.append(gold_cost)
            best_costs.append(best_cost)

    out = {
        "joint_allgold_picked": f"{joint_wins}/{trials}",
        "member_gold_first": f"{member_wins}/{member_trials}",
        "gold_set_mean_drift": round(float(np.mean(gold_drifts)), 4),
        "best_forged_combo_mean_drift": round(float(np.mean(best_costs)), 4),
        "conclusion": (
            "coherence ranking cannot identify gold among scale-consistent "
            "forgeries: authentic QoQ drift exceeds the flattest adversarial "
            "combo; defense = conflict flag + abstention"
        ),
    }
    print(json.dumps(out, indent=2))
    os.makedirs("eval_results", exist_ok=True)
    with open("eval_results/scale_adjudication_probe.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
