"""Dynamic query batcher tests: batching, trimming, errors, concurrency."""

import threading
import time

import pytest

from ragfin_tpu.serving.batcher import QueryBatcher


class RecordingSearch:
    def __init__(self, fail=False):
        self.calls = []
        self.fail = fail

    def __call__(self, queries, top_k):
        self.calls.append((list(queries), top_k))
        if self.fail:
            raise RuntimeError("search backend down")
        return [[f"{q}#hit{r}" for r in range(top_k)] for q in queries]


class TestBatcher:
    def test_single_query(self):
        backend = RecordingSearch()
        with QueryBatcher(backend) as b:
            hits = b.search("alpha", top_k=2)
        assert hits == ["alpha#hit0", "alpha#hit1"]

    def test_concurrent_queries_get_batched(self):
        backend = RecordingSearch()
        with QueryBatcher(backend, max_batch=16, max_wait_ms=50) as b:
            futures = [b.submit(f"q{i}", top_k=1) for i in range(8)]
            results = [f.result(timeout=10) for f in futures]
        assert [r[0] for r in results] == [f"q{i}#hit0" for i in range(8)]
        # Fewer dispatches than queries → batching actually happened.
        assert len(backend.calls) < 8
        assert sum(len(qs) for qs, _ in backend.calls) == 8

    def test_per_caller_topk_trim(self):
        backend = RecordingSearch()
        with QueryBatcher(backend, max_wait_ms=50) as b:
            f1 = b.submit("a", top_k=1)
            f2 = b.submit("b", top_k=3)
            assert len(f1.result(10)) == 1
            assert len(f2.result(10)) == 3
        # Shared dispatch ran at the max requested k.
        assert any(k == 3 for _, k in backend.calls)

    def test_backend_error_propagates(self):
        backend = RecordingSearch(fail=True)
        with QueryBatcher(backend) as b:
            with pytest.raises(RuntimeError, match="search backend down"):
                b.search("x")

    def test_threaded_callers(self):
        backend = RecordingSearch()
        out = {}
        with QueryBatcher(backend, max_batch=32, max_wait_ms=20) as b:
            def worker(i):
                out[i] = b.search(f"t{i}", top_k=1)

            threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
            [t.start() for t in threads]
            [t.join(timeout=30) for t in threads]
        assert len(out) == 16
        assert all(out[i] == [f"t{i}#hit0"] for i in range(16))

    def test_with_real_index(self, reference_root):
        import os

        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        chunks = build_corpus(os.path.join(reference_root, "extract_data"))
        index = DeviceVectorIndex.build(chunks)
        with QueryBatcher(index.search_texts, max_wait_ms=20) as b:
            f1 = b.submit("net profit Q1 FY2024", top_k=1)
            f2 = b.submit("total assets balance sheet Q3 FY2024", top_k=1)
            assert f1.result(30)[0].id == "icici_q1_fy2024_profitability_analysis"
            assert f2.result(30)[0].id == "icici_q3_fy2024_balance_sheet_health"
