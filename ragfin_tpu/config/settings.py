"""Environment-driven configuration (C16).

Behavior parity with the reference's two config variants
(``graph_rag_mcp/config/settings.py:10-92`` dataclass+getenv and
``FinRag_knowledge_graph/shared/config.py:16-44`` pydantic-settings),
implemented once: ``.env`` loading, cached singleton with ``cache_clear``-
based runtime model switching, per-model API-key lookup, model-dependent
timeouts (doubled for local llama), and a ``validate()`` that returns a list
of issues instead of raising.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Optional

from .constants import PORTS, SUPPORTED_MODELS


def load_dotenv(path: str = ".env") -> None:
    """Minimal .env loader (no python-dotenv dependency)."""
    if not os.path.exists(path):
        return
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, value = line.partition("=")
            os.environ.setdefault(key.strip(), value.strip().strip("'\""))


@dataclass
class Settings:
    # Model / provider
    default_model: str = "fake"
    gemini_api_key: Optional[str] = None
    openai_api_key: Optional[str] = None
    groq_api_key: Optional[str] = None
    ollama_base_url: str = "http://localhost:11434"

    # Data locations
    data_dir: str = "extract_data"
    chunks_snapshot: Optional[str] = None
    index_dir: str = ".ragfin_index"

    # Retrieval
    default_top_k: int = 3
    collection_name: str = "fin_chunks"
    # "hashed" = weight-free lexical (TF-IDF→JL); "trained" = the
    # from-scratch in-domain semantic encoder (models/domain_encoder.py,
    # checkpoint committed in checkpoints/domain_encoder/); "minilm" =
    # HF-checkpoint MiniLM (needs weights the zero-egress image lacks).
    # default_factory keeps the programmatic Settings() default identical
    # to the env-built one (_from_env): "trained" when the packaged
    # checkpoint exists, else "hashed" — two components of one deployment
    # must not silently embed with different encoders.
    embed_backend: str = field(default_factory=lambda: _default_backend())
    minilm_checkpoint: Optional[str] = None
    trained_checkpoint: Optional[str] = None  # None -> packaged default dir
    topk_method: str = "auto"  # "auto" | "dense" | "blocked" | "fused"
    # "float32" = exact f32 scoring (reference parity: Milvus stores f32);
    # "bfloat16" = the measured serving tier (~3x f32 QPS at 1M, recall
    # identical on all eval arms); "int8" = quantized tier (fastest, 4x
    # smaller HBM; the 10M-chunk north-star config).
    index_dtype: str = "float32"  # "float32" | "bfloat16" | "int8"
    # "flat" = exact search (improves on the reference's IVF_FLAT recall);
    # "ivf" = the reference's actual index type (cluster-pruned approximate,
    # nlist/nprobe semantics — chunking_storing (1).py:29).
    index_type: str = "flat"  # "flat" | "ivf"
    ivf_nprobe: int = 32

    # Integrity-weighted retrieval (retrieval/consistency.py): > 0 gates
    # similarity by in-text figure-consistency — the defense against
    # in-scope figure-tampered near-duplicates. Off by default (costs a
    # one-time host pass over the corpus on first use; a clean corpus
    # ranks identically).
    integrity_weight: float = 0.0

    # Serving ports (reference registry, SURVEY.md §5)
    ports: dict = field(default_factory=lambda: dict(PORTS))

    # Serving runtime
    batch_queries: bool = True  # dynamic micro-batching on the query path

    # Timeouts
    base_timeout_s: float = 30.0

    def get_api_key_for_model(self, model_name: str) -> Optional[str]:
        """Per-provider key lookup (reference settings.py:58-69)."""
        if "gemini" in model_name:
            return self.gemini_api_key
        if "gpt" in model_name:
            return self.openai_api_key
        if "llama" in model_name or "groq" in model_name:
            return self.groq_api_key
        return None

    def get_timeout_for_model(self, model_name: str) -> float:
        """Model-dependent timeouts: 2x for local llama (reference :37-56)."""
        if "llama" in model_name and not self.groq_api_key:
            return self.base_timeout_s * 2
        return self.base_timeout_s

    def validate(self) -> list[str]:
        """Return configuration issues as warnings (reference :71-87)."""
        issues = []
        if self.default_model not in SUPPORTED_MODELS:
            issues.append(f"unknown default_model '{self.default_model}'")
        if self.default_model != "fake" and not self.get_api_key_for_model(self.default_model):
            issues.append(f"no API key configured for '{self.default_model}'")
        if self.default_top_k < 1:
            issues.append("default_top_k must be >= 1")
        if self.embed_backend not in ("hashed", "trained", "minilm"):
            issues.append(f"unknown embed_backend '{self.embed_backend}'")
        if self.embed_backend == "minilm" and not self.minilm_checkpoint:
            issues.append("embed_backend=minilm without minilm_checkpoint (random init)")
        if self.embed_backend == "trained":
            from ..models.domain_encoder import DEFAULT_CKPT_DIR

            ckpt = self.trained_checkpoint or DEFAULT_CKPT_DIR
            if not os.path.exists(os.path.join(ckpt, "config.json")):
                issues.append(f"embed_backend=trained but no checkpoint at '{ckpt}'")
        if self.index_type not in ("flat", "ivf"):
            issues.append(f"unknown index_type '{self.index_type}'")
        if self.ivf_nprobe < 1:
            issues.append("ivf_nprobe must be >= 1")
        if self.integrity_weight > 0 and (
            self.index_type == "ivf" or self.embed_backend != "hashed"
        ):
            # Integrity weighting runs through the FilteredSearch pipeline,
            # which requires a flat index with the hashed featurizer; with
            # index_type=ivf or a featurizer-less semantic backend the
            # configured tamper defense will not apply (unless a flat
            # hashed index is loaded from index_dir — the engine's
            # /health `integrity_active` field reports the runtime truth).
            issues.append(
                "integrity_weight > 0 requires the FilteredSearch pipeline "
                "(index_type=flat + embed_backend=hashed); as configured it "
                "may never apply — check /health integrity_active"
            )
        return issues


def _default_backend() -> str:
    """The semantic encoder is the default wherever its committed checkpoint
    exists (reference parity: the reference always embeds semantically);
    images without the checkpoint fall back to the weight-free lexical
    backend rather than serving random weights."""
    from ..models.domain_encoder import DEFAULT_CKPT_DIR

    if os.path.exists(os.path.join(DEFAULT_CKPT_DIR, "config.json")):
        return "trained"
    return "hashed"


def _from_env() -> Settings:
    load_dotenv()
    env = os.environ
    return Settings(
        default_model=env.get("RAGFIN_MODEL", env.get("DEFAULT_MODEL", "fake")),
        gemini_api_key=env.get("GEMINI_API_KEY") or env.get("GOOGLE_API_KEY"),
        openai_api_key=env.get("OPENAI_API_KEY"),
        groq_api_key=env.get("GROQ_API_KEY"),
        ollama_base_url=env.get("OLLAMA_BASE_URL", "http://localhost:11434"),
        data_dir=env.get("RAGFIN_DATA_DIR", "extract_data"),
        chunks_snapshot=env.get("RAGFIN_CHUNKS_SNAPSHOT"),
        index_dir=env.get("RAGFIN_INDEX_DIR", ".ragfin_index"),
        default_top_k=int(env.get("RAGFIN_TOP_K", "3")),
        embed_backend=env.get("RAGFIN_EMBED_BACKEND", _default_backend()),
        minilm_checkpoint=env.get("RAGFIN_MINILM_CHECKPOINT"),
        trained_checkpoint=env.get("RAGFIN_TRAINED_CHECKPOINT"),
        topk_method=env.get("RAGFIN_TOPK_METHOD", "auto"),
        index_dtype=env.get("RAGFIN_INDEX_DTYPE", "float32"),
        index_type=env.get("RAGFIN_INDEX_TYPE", "flat"),
        ivf_nprobe=int(env.get("RAGFIN_IVF_NPROBE", "32")),
        integrity_weight=float(env.get("RAGFIN_INTEGRITY_WEIGHT", "0")),
        base_timeout_s=float(env.get("RAGFIN_TIMEOUT_S", "30")),
        batch_queries=env.get("RAGFIN_BATCH_QUERIES", "1") not in ("0", "false", "no"),
    )


@lru_cache(maxsize=1)
def get_config() -> Settings:
    return _from_env()


def switch_default_model(model_name: str) -> Settings:
    """Runtime model switch via env + cache clear (reference shared/config.py:59-64)."""
    os.environ["RAGFIN_MODEL"] = model_name
    get_config.cache_clear()
    return get_config()
