"""Multi-host (DCN) initialization helpers.

SURVEY.md §5: within a slice the sharded search rides ICI; across hosts the
standard JAX recipe applies — ``jax.distributed.initialize`` connects the
processes over DCN, after which ``jax.devices()`` spans every host and the
same ``Mesh``/``shard_map`` programs (:mod:`ragfin_tpu.parallel.sharded`)
run unchanged with XLA routing cross-host collectives over DCN.

Single-host environments (this image has one chip) run through the same code
path with ``num_processes=1``, so the call sites stay uniform.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .mesh import make_mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Connect this process to the job (no-op for single-process runs).

    Arguments default from the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``)
    so launchers can configure purely through the environment.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1")
    )
    process_id = process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0"))

    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_id": process_id,
        "num_processes": num_processes,
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def global_corpus_mesh(axis: str = "data"):
    """1-D mesh over every device in the job (local or multi-host).

    Within one host the shard axis rides ICI; across hosts the all-gather
    candidate merge (tiny: P·k pairs per query) crosses DCN — the merge was
    designed so only top-k candidates, never corpus data, cross the slower
    fabric.
    """
    return make_mesh((axis,), devices=jax.devices())
