"""Graph store at scale (round-1 verdict #5): columnar bulk ingestion,
the streaming Pallas first-k match path (≥2^18 facts), true k-hop
expansion, and persistence format compatibility."""

import json
import os

import numpy as np
import pytest

from ragfin_tpu.index.graph_index import (
    BALANCE, METRIC, RATIO, SEGMENT, GraphIndex, masked_first_k,
)


@pytest.fixture(scope="module")
def big_graph():
    """~300k facts via the bulk path — crosses the 2^18 Pallas threshold."""
    g = GraphIndex()
    rng = np.random.default_rng(0)
    n = 300_000
    quarters = [f"Q{q}_FY{y}" for y in range(2018, 2025) for q in range(1, 5)]
    qv = g.intern_quarters(quarters)
    ev = g.intern_entities([f"Metric {i}" for i in range(64)] + ["Net Profit"])
    g.add_facts_bulk(
        quarter_ids=qv[rng.integers(0, len(qv), n)],
        entity_ids=ev[rng.integers(0, len(ev), n)],
        type_ids=rng.integers(0, 4, n).astype(np.int32),
        values=rng.uniform(1, 1e5, n).astype(np.float32),
        dataset_id="synthetic",
    )
    # One distinguished fact: Net Profit / Q1_FY2024 / METRIC with value 777.
    g.add_facts_bulk(
        quarter_ids=g.intern_quarters(["Q1_FY2024"]),
        entity_ids=g.intern_entities(["Unique Sentinel Metric"]),
        type_ids=np.array([METRIC], np.int32),
        values=np.array([777.0], np.float32),
        dataset_id="sentinel",
    )
    return g


class TestBulkAndScaleMatch:
    def test_bulk_count(self, big_graph):
        assert big_graph.n_facts == 300_001
        assert big_graph.stats()["total_facts"] == 300_001

    def test_match_uses_first_k_path_and_finds_sentinel(self, big_graph):
        out = big_graph.match(
            quarters=["Q1_FY2024"], names=["Unique Sentinel Metric"], types=[METRIC]
        )
        assert len(out) == 1
        assert out[0]["value"] == 777.0
        assert out[0]["quarter"] == "Q1_FY2024"

    def test_match_order_is_chronological_csr(self, big_graph):
        out = big_graph.match(names=["Net Profit"], limit=30)
        quarters = [r["quarter"] for r in out]
        # CSR order: non-decreasing chronological quarter sequence.
        from ragfin_tpu.index.graph_index import _period_key

        assert quarters == sorted(quarters, key=_period_key)

    def test_scale_match_agrees_with_numpy_oracle(self, big_graph):
        packed = big_graph._pack()
        host = packed["host"]
        want_e = big_graph._entity_id["Metric 7"]
        oracle_rows = np.nonzero(
            (host["entity_ids"] == want_e) & (host["type_ids"] == SEGMENT)
        )[0][:25]
        out = big_graph.match(names=["Metric 7"], types=[SEGMENT], limit=25)
        got_vals = [r["revenue"] for r in out]
        exp_vals = [float(host["value"][i]) for i in oracle_rows]
        assert got_vals == exp_vals


class TestMaskedFirstK:
    def test_matches_nonzero(self):
        rng = np.random.default_rng(1)
        hit = (rng.uniform(size=300_000) < 0.001).astype(np.int8)
        ids, cnt = masked_first_k(np.asarray(hit), 20, interpret=True)
        expected = np.nonzero(hit)[0][:20]
        assert list(np.asarray(ids))[: len(expected)] == list(expected)
        assert int(cnt) == min(20, len(np.nonzero(hit)[0]))

    def test_no_hits(self):
        hit = np.zeros((200_000,), np.int8)
        ids, cnt = masked_first_k(np.asarray(hit), 5, interpret=True)
        assert int(cnt) == 0
        assert int(np.asarray(ids)[0]) == 0x7FFFFFFF

    def test_hits_in_final_tile(self):
        hit = np.zeros((300_000,), np.int8)
        hit[-3:] = 1
        ids, cnt = masked_first_k(np.asarray(hit), 5, interpret=True)
        assert list(np.asarray(ids))[:3] == [299_997, 299_998, 299_999]
        assert int(cnt) == 3


class TestKHopExpand:
    @pytest.fixture()
    def chain_graph(self):
        """Entity/quarter chain: A-Q1, B-Q1, B-Q2, C-Q2, C-Q3, D-Q3 — hop
        counts are observable because quarters don't all co-occur."""
        g = GraphIndex()
        facts = [("A", "QA_1"), ("B", "QA_1"), ("B", "QA_2"), ("C", "QA_2"),
                 ("C", "QA_3"), ("D", "QA_3")]
        # Use valid period strings for the vocab.
        periods = {"QA_1": "Q1_FY2020", "QA_2": "Q2_FY2020", "QA_3": "Q3_FY2020"}
        for ent, qq in facts:
            g.add_facts_bulk(
                quarter_ids=g.intern_quarters([periods[qq]]),
                entity_ids=g.intern_entities([f"Entity {ent}"]),
                type_ids=np.array([METRIC], np.int32),
                values=np.array([1.0], np.float32),
            )
        return g

    def test_one_hop(self, chain_graph):
        out = chain_graph.expand(["Entity A"], hops=1)
        quarters = {r["quarter"] for r in out}
        assert quarters == {"Q1_FY2020"}  # only A's quarter

    def test_two_hops_reach_next_quarter(self, chain_graph):
        out = chain_graph.expand(["Entity A"], hops=2)
        quarters = {r["quarter"] for r in out}
        # Hop 2: B co-occurs with A in Q1 and also lives in Q2.
        assert quarters == {"Q1_FY2020", "Q2_FY2020"}

    def test_three_hops_reach_all(self, chain_graph):
        out = chain_graph.expand(["Entity A"], hops=3, limit=30)
        quarters = {r["quarter"] for r in out}
        assert quarters == {"Q1_FY2020", "Q2_FY2020", "Q3_FY2020"}


class TestPersistence:
    def test_columnar_roundtrip(self, tmp_path):
        g = GraphIndex()
        g.add_facts_bulk(
            quarter_ids=g.intern_quarters(["Q1_FY2024", "Q2_FY2024"]),
            entity_ids=g.intern_entities(["Net Profit", "Total Income"]),
            type_ids=np.array([METRIC, METRIC], np.int32),
            values=np.array([10636.0, 57292.0], np.float32),
            unit="crore",
            dataset_id="ds1",
        )
        g.save(str(tmp_path))
        g2 = GraphIndex.load(str(tmp_path))
        assert g2.stats()["total_facts"] == 2
        out = g2.match(names=["Net Profit"])
        assert out[0]["value"] == 10636.0
        assert out[0]["unit"] == "crore"

    def test_loads_round1_json_format(self, tmp_path):
        legacy = {
            "company": "ICICI Bank",
            "quarters": ["Q1_FY2024"],
            "entities": ["Net Profit"],
            "rows": [[0, 0, 0, 10636.0, 44.0, None, "crore", "chunk1", "ds"]],
            "organizations": {"ICICI Bank": ["Q1_FY2024"]},
            "quarter_sources": {"Q1_FY2024": ["chunk1"]},
        }
        (tmp_path / "graph.json").write_text(json.dumps(legacy))
        g = GraphIndex.load(str(tmp_path))
        out = g.match(names=["Net Profit"])
        assert out[0]["value"] == 10636.0 and out[0]["growth"] == 44.0
        assert out[0]["source_chunk"] == "chunk1"


class TestBitpackedMaskOps:
    """_mask_lookup / _scatter_any must match their gather/scatter oracles
    for every vocab size class, including the >1024 fallback boundary —
    they carry the 27-48x 10M-fact match/expand speedups and any semantic
    drift would silently corrupt graph results."""

    @pytest.mark.parametrize("vocab", [1, 28, 32, 33, 512, 1024, 1025])
    def test_mask_lookup_matches_gather(self, vocab):
        import jax.numpy as jnp

        from ragfin_tpu.index.graph_index import _mask_lookup

        rng = np.random.default_rng(vocab)
        mask = jnp.asarray(rng.random(vocab) < 0.4)
        ids = jnp.asarray(rng.integers(0, vocab, 10_000).astype(np.int32))
        got = np.asarray(_mask_lookup(mask, ids))
        want = np.asarray(mask)[np.asarray(ids)]
        assert np.array_equal(got, want)

    @pytest.mark.parametrize("vocab", [1, 28, 32, 33, 512, 1024, 1025])
    def test_scatter_any_matches_scatter(self, vocab):
        import jax.numpy as jnp

        from ragfin_tpu.index.graph_index import _scatter_any

        rng = np.random.default_rng(vocab + 7)
        ids = jnp.asarray(rng.integers(0, vocab, 10_000).astype(np.int32))
        hit = jnp.asarray(rng.random(10_000) < 0.01)
        got = np.asarray(_scatter_any(ids, hit, vocab))
        want = np.zeros(vocab, bool)
        np.maximum.at(want, np.asarray(ids), np.asarray(hit))
        assert np.array_equal(got, want)
