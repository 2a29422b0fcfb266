"""Scale, concurrency, and failure-injection tests (SURVEY.md §5 aux:
failure detection / recovery; the reference has only try/except-to-status
at tool boundaries — these tests pin that contract here)."""

import asyncio
import json
import threading

import numpy as np
import pytest

from ragfin_tpu.data.models import ExtractedEntities, FinancialMetric
from ragfin_tpu.index.graph_index import GraphIndex, METRIC
from ragfin_tpu.llm.providers import FakeProvider, ProviderError


class TestGraphScale:
    def test_hundred_thousand_facts(self):
        """Masked-match stays correct and fast on a 100k-fact table."""
        g = GraphIndex()
        rng = np.random.default_rng(0)
        quarters = [f"Q{q}_FY{y}" for y in range(2020, 2045) for q in range(1, 5)]
        # 100 quarters x 1000 metrics = 100k facts, appended in one pass.
        for qi, quarter in enumerate(quarters):
            ents = ExtractedEntities(
                quarter=quarter,
                financial_metrics=[
                    FinancialMetric(name=f"M{m}", value=float(qi * 1000 + m))
                    for m in range(1000)
                ],
            )
            g.save_entities(ents, chunk_id=f"chunk_{quarter}")
        assert g.stats()["total_facts"] == 100_000
        rows = g.match(quarters=["Q3_FY2031"], names=["M17"], types=[METRIC])
        assert len(rows) == 1
        qi = quarters.index("Q3_FY2031")
        assert rows[0]["value"] == qi * 1000 + 17
        # Trend across all 100 quarters, capped by limit.
        rows = g.match(names=["M999"], types=[METRIC], limit=100)
        assert len(rows) == 100
        assert rows[0]["quarter"] == quarters[0]

    def test_incremental_append_invalidates_pack(self):
        g = GraphIndex()
        g.save_entities(
            ExtractedEntities(quarter="Q1_FY2024", financial_metrics=[FinancialMetric(name="A", value=1.0)]),
            "c1",
        )
        assert len(g.match(names=["A"])) == 1
        g.save_entities(
            ExtractedEntities(quarter="Q2_FY2024", financial_metrics=[FinancialMetric(name="A", value=2.0)]),
            "c2",
        )
        assert len(g.match(names=["A"])) == 2  # repacked after mutation


class TestFailureInjection:
    def test_provider_error_yields_error_answer(self, reference_root):
        import os

        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.index.vector_index import DeviceVectorIndex
        from ragfin_tpu.retrieval.vector_rag import VectorRAG

        def boom(prompt):
            raise ProviderError("injected failure")

        chunks = build_corpus(os.path.join(reference_root, "extract_data"))[:4]
        rag = VectorRAG(DeviceVectorIndex.build(chunks), FakeProvider(responder=boom))
        out = asyncio.run(rag.search_and_answer("net profit?"))
        assert out["answer_mode"] == "error"
        assert "injected failure" in out["answer"]
        assert out["contexts"]  # retrieval still succeeded

    def test_graph_query_provider_failure_falls_back(self, reference_root):
        import os

        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.extraction.service import rule_based_extract
        from ragfin_tpu.retrieval.graph_rag import GraphQueryEngine

        def boom(prompt):
            raise ProviderError("planner down")

        g = GraphIndex()
        chunks = build_corpus(os.path.join(reference_root, "extract_data"))
        for c in chunks:
            g.save_entities(rule_based_extract(c.text), c.id)
        engine = GraphQueryEngine(g, FakeProvider(responder=boom))
        out = asyncio.run(engine.query("What was net profit in Q1 FY2024?"))
        assert out["results"]  # lexical fallback answered

    def test_mcp_tool_exception_becomes_status(self, reference_root):
        import os

        from ragfin_tpu.config.settings import Settings
        from ragfin_tpu.serving.engine import RagFinEngine
        from ragfin_tpu.serving.httpd import AppServer
        from ragfin_tpu.serving.mcp import MCPToolServer
        from ragfin_tpu.serving.mcp_client import MCPClient

        server = MCPToolServer("failing")

        @server.tool(description="always fails")
        def explode():
            raise RuntimeError("kaput")

        app = AppServer(server.app).start_background()
        try:
            # The server converts the exception to an isError result (the
            # MCP failure contract) and the client surfaces it as an
            # exception rather than returning the error payload as data.
            from ragfin_tpu.serving.mcp_client import MCPClientError

            with pytest.raises(MCPClientError, match="kaput"):
                MCPClient(f"http://127.0.0.1:{app.port}").call_tool("explode")
        finally:
            app.stop()

    def test_builder_counts_partial_failures(self):
        from ragfin_tpu.retrieval.graph_rag import GraphBuilder

        class FlakyExtractor:
            current_model = "flaky"
            calls = 0

            async def extract(self, chunk):
                self.calls += 1
                if self.calls % 2 == 0:
                    raise RuntimeError("flaky")
                return ExtractedEntities(
                    quarter="Q1_FY2024",
                    financial_metrics=[FinancialMetric(name="X", value=1.0)],
                )

        builder = GraphBuilder(extractor=FlakyExtractor())
        chunks = [
            {"id": f"c{i}", "period": "Q1_FY2024", "type": "t", "size": 20, "text": "x" * 20}
            for i in range(4)
        ]
        result = asyncio.run(builder.build(chunks))
        assert result["chunks_processed"] == 2
        assert result["chunks_failed"] == 2
        assert len(result["failed_chunk_ids"]) == 2


class TestConcurrency:
    def test_parallel_mcp_calls(self, reference_root):
        """Threaded MCP clients against one server: no cross-talk, all succeed
        (the serving layer is thread-per-request; engine reads are lock-free)."""
        import os

        from ragfin_tpu.config.settings import Settings
        from ragfin_tpu.serving.engine import RagFinEngine
        from ragfin_tpu.serving.httpd import AppServer
        from ragfin_tpu.serving.mcp import build_vector_mcp
        from ragfin_tpu.serving.mcp_client import MCPClient

        settings = Settings(default_model="fake", data_dir=os.path.join(reference_root, "extract_data"), index_dir="")
        engine = RagFinEngine(settings)
        app = AppServer(build_vector_mcp(engine).app).start_background()
        url = f"http://127.0.0.1:{app.port}"
        errors = []
        results = [None] * 8

        def worker(i):
            try:
                client = MCPClient(url)
                q = ["net profit Q1", "treasury Q3", "EPS Q4", "total assets Q2"][i % 4]
                results[i] = client.call_tool("search_vectors", {"query": q, "top_k": 2})
            except Exception as e:
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        [t.start() for t in threads]
        [t.join(timeout=60) for t in threads]
        app.stop()
        assert not errors
        assert all(r and r["success"] for r in results)
