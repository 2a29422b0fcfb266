"""Multi-chip IVF (parallel/sharded_ivf.py): cells sharded over the mesh,
probe routing by ownership, all-gather candidate merge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragfin_tpu.ops.ivf import build_ivf, ivf_topk
from ragfin_tpu.parallel.mesh import make_mesh
from ragfin_tpu.parallel.sharded_ivf import shard_ivf_arrays, sharded_ivf_topk


def _clustered(seed=7, n=2048, d=64, n_centers=16):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 4.0
    pts = np.concatenate(
        [c + 0.3 * rng.standard_normal((n // n_centers, d)).astype(np.float32) for c in centers]
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pts[rng.permutation(n)].T.copy()  # [D, N]


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(("cells",))


@pytest.fixture(scope="module")
def setup(mesh):
    ct = _clustered()
    ivf = build_ivf(jnp.asarray(ct), cell=128, iters=2)  # 16 cells / 8 devs
    arrays = shard_ivf_arrays(mesh, "cells", ivf)
    return ct, ivf, arrays


class TestShardedIVF:
    def test_exhaustive_matches_single_device(self, mesh, setup):
        """nprobe == n_cells: the sharded scan must agree with the
        single-device IVF kernel (same scores; ids may differ only on
        exact-score ties)."""
        ct, ivf, (cells, scales, ids, centroids, n_real) = setup
        rng = np.random.default_rng(3)
        base = ct.T[rng.integers(0, ct.shape[1], 16)]
        q = base + 0.1 * rng.standard_normal(base.shape).astype(np.float32)
        q = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))

        s_sh, i_sh = sharded_ivf_topk(
            mesh, "cells", q, cells, scales, ids, centroids,
            k=10, nprobe=ivf.n_cells, block_q=8,
        )
        s_1d, i_1d = ivf_topk(q, ivf, k=10, nprobe=ivf.n_cells, block_q=8)
        np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_1d), rtol=1e-4, atol=1e-5)
        assert (np.asarray(i_sh) == np.asarray(i_1d)).mean() > 0.95

    def test_pruned_recall(self, mesh, setup):
        """Pruned sharded probing reaches the same recall regime as the
        single-device tier on clustered queries."""
        ct, ivf, (cells, scales, ids, centroids, n_real) = setup
        rng = np.random.default_rng(5)
        base = ct.T[rng.integers(0, ct.shape[1], 32)]
        q = base + 0.1 * rng.standard_normal(base.shape).astype(np.float32)
        q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)

        exact = np.argsort(-(q @ np.asarray(ct)), axis=1)[:, :10]
        _, i_sh = sharded_ivf_topk(
            mesh, "cells", jnp.asarray(q), cells, scales, ids, centroids,
            k=10, nprobe=4, block_q=8,
        )
        got = np.asarray(i_sh)
        recall = np.mean([len(set(got[r]) & set(exact[r])) / 10 for r in range(len(q))])
        assert recall >= 0.85, f"sharded pruned recall {recall}"

    def test_int8_cells(self, mesh):
        ct = _clustered(seed=9)
        ivf = build_ivf(jnp.asarray(ct), cell=128, iters=2, quantize=True)
        cells, scales, ids, centroids, n_real = shard_ivf_arrays(mesh, "cells", ivf)
        assert scales is not None
        rng = np.random.default_rng(4)
        base = ct.T[rng.integers(0, ct.shape[1], 8)]
        q = base / np.linalg.norm(base, axis=1, keepdims=True)
        s, i = sharded_ivf_topk(
            mesh, "cells", jnp.asarray(q.astype(np.float32)), cells, scales,
            ids, centroids, k=5, nprobe=ivf.n_cells, block_q=8,
        )
        # Exhaustive probing == exact search in the SAME (dequantized int8)
        # score space — this corpus's neighbor gaps (~1e-4) sit below int8
        # noise (~1e-3), so comparing against the f32 oracle would measure
        # quantization, not the sharded scan.
        dq = np.zeros((ct.shape[1], ct.shape[0]), np.float32)
        cells_np = np.asarray(ivf.cells, dtype=np.float32) * np.asarray(ivf.scales)
        ids_np = np.asarray(ivf.orig_ids).reshape(cells_np.shape[0], -1)
        for c in range(cells_np.shape[0]):
            for slot in range(ids_np.shape[1]):
                oid = ids_np[c, slot]
                if oid < ct.shape[1]:
                    dq[oid] = cells_np[c, :, slot]
        exact = np.argsort(-(q.astype(np.float32) @ dq.T), axis=1, kind="stable")[:, :5]
        got = np.asarray(i)
        overlap = np.mean([len(set(got[r]) & set(exact[r])) / 5 for r in range(len(q))])
        assert overlap >= 0.9, f"overlap {overlap}"

    def test_cell_padding_to_mesh(self, mesh):
        """A cell count not divisible by the mesh size pads with empty cells
        that can never win."""
        ct = _clustered(seed=11, n=1280, n_centers=10)  # 10 cells / 8 devs
        ivf = build_ivf(jnp.asarray(ct), cell=128, iters=1)
        cells, scales, ids, centroids, n_real = shard_ivf_arrays(mesh, "cells", ivf)
        assert cells.shape[0] % 8 == 0
        q = jnp.asarray(ct.T[:4] / np.linalg.norm(ct.T[:4], axis=1, keepdims=True))
        s, i = sharded_ivf_topk(
            mesh, "cells", q, cells, scales, ids, centroids,
            k=5, nprobe=cells.shape[0], block_q=4, n_cells_real=n_real,
        )
        ids_np = np.asarray(i)
        assert ids_np.max() < ct.shape[1]  # never a pad id
        assert list(ids_np[:, 0]) == [0, 1, 2, 3]  # self-retrieval

    def test_pad_cells_never_steal_probes(self, mesh):
        """Round-3 review regression: with pad cells present and PRUNED
        probing, queries with negative coordinate sums must still retrieve
        (a constant pad-centroid value has affinity value*sum(q), which is
        hugely positive for sum(q)<0 and used to take every probe slot,
        returning _INT_MAX for the whole tile)."""
        rng = np.random.default_rng(13)
        d, n = 32, 1280  # 10 cells of 128 -> 6 pads on the 8-device mesh
        pts = rng.standard_normal((n, d)).astype(np.float32) - 0.5  # negative-sum heavy
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        ivf = build_ivf(jnp.asarray(pts.T.copy()), cell=128, iters=1)
        cells, scales, ids, centroids, n_real = shard_ivf_arrays(mesh, "cells", ivf)
        q = jnp.asarray(pts[:8])  # self-queries, many with sum(q) < 0
        assert float(np.asarray(q).sum(axis=1).min()) < 0  # scenario is live
        s, i = sharded_ivf_topk(
            mesh, "cells", q, cells, scales, ids, centroids,
            k=5, nprobe=6, block_q=4, n_cells_real=n_real,
        )
        ids_np = np.asarray(i)
        assert (ids_np[:, 0] < n).all(), f"probe slots stolen by pads: {ids_np[:, 0]}"
        assert (ids_np[:, 0] == np.arange(8)).mean() >= 0.75  # self-retrieval mostly works
