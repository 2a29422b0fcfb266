"""ragfin_tpu — a TPU-native financial retrieval framework.

A from-scratch rebuild of the capabilities of ``oi-taa/rag-fin`` (financial
vector + graph RAG over quarterly bank filings) designed TPU-first:

- the embed+upsert pipeline (reference: ``chunking_storing (1).py``) becomes a
  jitted batch encoder writing an HBM-resident packed embedding matrix
  (:mod:`ragfin_tpu.index.vector_index`),
- cosine top-k search (reference: ``retrieve.py``) becomes a fused Pallas
  matmul + k-selection kernel (:mod:`ragfin_tpu.ops.topk`),
- the Neo4j knowledge graph + Cypher strategies (reference: ``graph_cons.py``,
  ``graph_rag_mcp/``) become a device-resident CSR graph store with masked
  gather kernels (:mod:`ragfin_tpu.index.graph_index`),
- hybrid vector+graph fusion (reference: ``graph_cons.py:268-342``) becomes an
  on-device score merge (:mod:`ragfin_tpu.ops.fusion`),
- the corpus shards one partition per chip over a ``jax.sharding.Mesh`` with
  per-shard top-k merged via ICI collectives (:mod:`ragfin_tpu.parallel`).

Host-side layers (chunking, LLM providers, REST/MCP serving, evaluation)
mirror the reference's public API surface.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("RAGFIN_PLATFORM"):
    # Hard platform pin honored before any device op. The standard
    # JAX_PLATFORMS env filter is ignored by out-of-tree plugin backends in
    # some images (the axon TPU tunnel here), so serving/CLI processes that
    # must not touch the TPU (e.g. while a benchmark owns the single tunnel
    # client slot) set RAGFIN_PLATFORM=cpu instead.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["RAGFIN_PLATFORM"])
