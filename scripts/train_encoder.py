"""Train the from-scratch in-domain semantic encoder (VERDICT r3 item #1).

Usage:
    [TRAIN_PLATFORM=tpu|cpu] [STEPS=2000] [BATCH=256] [LAYERS=4]
    [SCAN_CHUNK=25] [CKPT_DIR=checkpoints/domain_encoder]
    python scripts/train_encoder.py

Tunnel discipline (CLAUDE.md): one TPU client per process; run under
`timeout` and requeue rather than debug a hung window. The trainer
checkpoints every few scan-chunks, so a killed run resumes its investment
by simply re-running (fresh init but cheap) or lowering STEPS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TRAIN_PLATFORM", "tpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    from ragfin_tpu.models.domain_encoder import DEFAULT_CKPT_DIR, train_domain_encoder
    from ragfin_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    init_from = os.environ.get("INIT_FROM") or None
    vocab_extra = []
    ref = os.environ.get("REFERENCE_ROOT", "/root/reference")
    data_dir = os.path.join(ref, "extract_data")
    if init_from:
        # Warm start reuses the parent vocabulary — skip the (slow) vocab
        # text collection entirely.
        data_dir = ""
    if os.path.isdir(data_dir):
        from ragfin_tpu.data.loader import build_corpus

        vocab_extra = [c.text for c in build_corpus(data_dir)]
    # Round-5 vocabulary growth from realistic in-image financial text
    # (VERDICT #1: reference PDFs and qa_subset QUESTION texts are fair
    # vocab sources; eval answers and the hand-written holdout are not).
    qa_path = "" if init_from else os.path.join(ref, "qa_subset.json")
    if os.path.exists(qa_path):
        from ragfin_tpu.eval.datasets import load_qa_subset

        vocab_extra += [q.question for q in load_qa_subset(qa_path)]
    import glob
    import re as _re

    from ragfin_tpu.data.pdf_extractor import extract_text

    pdf_glob = [] if init_from else sorted(
        glob.glob(os.path.join(ref, "FinRag_Parameter_Extractor", "*", "*.pdf"))
    )
    for pdf in pdf_glob:
        try:
            txt = extract_text(pdf)
        except Exception:
            continue
        # Keep only lines that read as English (some PDFs decode to glyph
        # garbage); require a high ratio of plain alphabetic words.
        lines = []
        for line in txt.split("\n"):
            words = line.split()
            alpha = [w for w in words if _re.fullmatch(r"[A-Za-z][A-Za-z'&.-]*", w)]
            if len(words) >= 3 and len(alpha) >= 0.7 * len(words):
                lines.append(line)
        if len(lines) >= 50:
            vocab_extra.append("\n".join(lines))

    t0 = time.time()
    result = train_domain_encoder(
        steps=int(os.environ.get("STEPS", 2000)),
        batch_size=int(os.environ.get("BATCH", 256)),
        num_layers=int(os.environ.get("LAYERS", 4)),
        learning_rate=float(os.environ.get("LR", 3e-4)),
        scan_chunk=int(os.environ.get("SCAN_CHUNK", 25)),
        seed=int(os.environ.get("SEED", 0)),
        ckpt_dir=os.environ.get("CKPT_DIR", DEFAULT_CKPT_DIR),
        vocab_extra_texts=vocab_extra,
        init_from=init_from,
    )
    result["platform"] = jax.devices()[0].platform
    result["total_wall_s"] = round(time.time() - t0, 1)
    print("TRAIN_RESULT " + json.dumps({k: v for k, v in result.items() if k != "history"}))


if __name__ == "__main__":
    main()
