"""Split graph_match_attrib's 98 ms: predicate pass vs first-k kernel.

Times, scan-amortized over 8 mask triples at 10M facts:
  pred  — _predicate only (3 small-table gathers + ANDs over 10M rows)
  fk    — masked_first_k only, on a PRECOMPUTED hit vector
  both  — the production composition (should ≈ pred + fk)

Usage: python scripts/graph_attrib2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from ragfin_tpu.utils.device import enable_compilation_cache

enable_compilation_cache()

from ragfin_tpu.index.graph_index import _predicate, masked_first_k

N, REPS, K = 10_000_000, 8, 30
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_results.log")


def main() -> None:
    rng = np.random.default_rng(0)
    nq, ne = 28, 512
    qids = jnp.asarray(rng.integers(0, nq, N).astype(np.int32))
    eids = jnp.asarray(rng.integers(0, ne, N).astype(np.int32))
    tids = jnp.asarray(rng.integers(0, 4, N).astype(np.int32))
    valid = jnp.ones((N,), bool)
    qms = np.zeros((REPS, nq), bool); ems = np.zeros((REPS, ne), bool); tms = np.zeros((REPS, 4), bool)
    for i in range(REPS):
        qms[i, i % nq] = True; ems[i, i] = True; tms[i, 0] = True
    qms, ems, tms = jnp.asarray(qms), jnp.asarray(ems), jnp.asarray(tms)
    hits = jnp.stack([
        _predicate(qids, eids, tids, valid, qms[i], ems[i], tms[i]) for i in range(REPS)
    ])
    np.asarray(hits[0, 0])

    def timed(fn, *args):
        run = jax.jit(fn)
        np.asarray(run(*args))
        t0 = time.perf_counter()
        np.asarray(run(*args))
        return (time.perf_counter() - t0) / REPS * 1e3

    def pred_only(qids, eids, tids, valid, qms, ems, tms):
        def step(c, x):
            qm, em, tm = x
            h = _predicate(qids, eids, tids, valid, qm, em, tm)
            return c + jnp.sum(h.astype(jnp.int32)), None
        acc, _ = jax.lax.scan(step, jnp.int32(0), (qms, ems, tms))
        return acc

    def fk_only(hits):
        def step(c, h):
            ids, cnt = masked_first_k(h, K)
            return c + ids.sum() + cnt.sum(), None
        acc, _ = jax.lax.scan(step, jnp.int32(0), hits)
        return acc

    t_pred = timed(pred_only, qids, eids, tids, valid, qms, ems, tms)
    t_fk = timed(fk_only, hits)
    line = f"graph_attrib2 N=10M: pred={t_pred:.2f} fk={t_fk:.2f} ms/match (scan-amortized)"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
