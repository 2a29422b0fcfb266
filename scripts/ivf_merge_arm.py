"""Re-run ONLY the IVF agreement arm of the 1M distractor eval and merge it
into the existing artifact.

The full-scale regeneration (post placeholder-corruption fix) was interrupted
after the in-scope arms, before `_ivf_agreement` ran, so the artifact lost its
`ivf_vs_exact_overlap@10` section. This rebuilds the SAME main index
(same seed, same N) and re-measures the IVF-vs-exact overlap curve.

Usage: python scripts/ivf_merge_arm.py   (CPU only, never touches the tunnel)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

N = int(os.environ.get("DISTRACTOR_N", 1_000_000))
REF = os.environ.get("REFERENCE_ROOT", "/root/reference")


def main() -> None:
    from distractor_eval import _ivf_agreement

    from ragfin_tpu.data.loader import build_corpus
    from ragfin_tpu.eval.datasets import load_qa_subset
    from ragfin_tpu.eval.distractors import generate_distractors
    from ragfin_tpu.index.vector_index import DeviceVectorIndex

    t0 = time.perf_counter()
    real = build_corpus(os.path.join(REF, "extract_data"))
    dis = generate_distractors(N, seed=1)
    idx = DeviceVectorIndex.build(list(real) + dis)
    print(f"[{time.perf_counter()-t0:7.1f}s] index built: {len(idx):,} chunks", flush=True)
    qa = load_qa_subset(os.path.join(REF, "qa_subset.json"))

    path = f"eval_results/distractor_eval_{N}.json"
    with open(path) as f:
        out = json.load(f)
    _ivf_agreement(idx, qa, out)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("merged IVF agreement into", path)


if __name__ == "__main__":
    main()
