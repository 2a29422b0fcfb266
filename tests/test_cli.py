"""CLI subcommand tests (in-process main() invocations)."""

import json
import os

import pytest

from ragfin_tpu.cli import main


class TestCLI:
    def test_chunk(self, reference_root, tmp_path, capsys):
        out = tmp_path / "chunks.json"
        rc = main(["chunk", "--data", f"{reference_root}/extract_data", "--out", str(out)])
        assert rc == 0
        data = json.loads(out.read_text())
        assert len(data) == 16
        assert {"id", "period", "type", "size", "text"} <= set(data[0])

    def test_build_index_and_query(self, reference_root, tmp_path, capsys):
        idx = tmp_path / "idx"
        rc = main(["build-index", "--data", f"{reference_root}/extract_data", "--out", str(idx)])
        assert rc == 0
        assert (idx / "index.json").exists() and (idx / "graph" / "graph.json").exists()
        capsys.readouterr()
        rc = main([
            "query", "What was ICICI Bank's net profit in Q1 FY2024?",
            "--mode", "vector", "--data", f"{reference_root}/extract_data",
            "--index", str(idx),
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["contexts"][0]["id"] == "icici_q1_fy2024_profitability_analysis"
        assert "10,636" in out["answer"]

    def test_eval_gate(self, reference_root, tmp_path, capsys):
        rc = main([
            "eval", "--dataset", "qa", "--k", "10", "--min-recall", "0.99",
            "--data", f"{reference_root}/extract_data", "--index", "",
            "--summary", str(tmp_path / "rs.json"),
        ])
        assert rc == 0
        summary = json.loads((tmp_path / "rs.json").read_text())
        assert summary["retrieval_metrics"]["recall_mean"] == 1.0

    def test_eval_gate_fails_on_impossible_threshold(self, reference_root, capsys):
        rc = main([
            "eval", "--dataset", "qa", "--k", "1", "--min-recall", "1.01",
            "--data", f"{reference_root}/extract_data", "--index", "",
        ])
        assert rc == 1

    def test_extract_pdf(self, capsys):
        path = "/root/reference/FinRag_Parameter_Extractor/single_reports/sbi_consolidated24.pdf"
        if not os.path.exists(path):
            pytest.skip("PDF not mounted")
        rc = main(["extract-pdf", path])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["reportType"] == "CONSOLIDATED FINANCIAL RESULTS"
        assert "text" not in out  # trimmed without --full-text


class TestLauncher:
    def test_launch_all_services_ephemeral(self, reference_root):
        import httpx

        from ragfin_tpu.config.settings import Settings
        from ragfin_tpu.serving.engine import RagFinEngine
        from ragfin_tpu.serving.main import ALL_SERVICES, launch

        settings = Settings(default_model="fake",
                            data_dir=f"{reference_root}/extract_data", index_dir="")
        engine = RagFinEngine(settings)
        # Port 0 everywhere → ephemeral, no clash with a real deployment.
        servers = launch(ALL_SERVICES, ports={name: 0 for name in ALL_SERVICES}, engine=engine)
        try:
            assert set(servers) == set(ALL_SERVICES)
            r = httpx.get(f"http://127.0.0.1:{servers['entity_service'].port}/health")
            assert r.json()["status"] == "healthy"
            r = httpx.post(
                f"http://127.0.0.1:{servers['vector_adapter'].port}/search",
                json={"query": "net profit", "top_k": 1},
            )
            assert r.json()["success"]
        finally:
            for server in servers.values():
                server.stop()


class TestInteractive:
    def test_question_required_without_interactive(self, reference_root, capsys):
        rc = main(["query", "--data", f"{reference_root}/extract_data", "--index", ""])
        assert rc == 2

    def test_interactive_loop(self, reference_root, capsys, monkeypatch):
        """Reference retrieve.py:90-111 parity: canned questions then a
        stdin loop that exits on 'quit'."""
        answers = iter(["What was EPS in Q1 FY2024?", "quit"])
        monkeypatch.setattr("builtins.input", lambda *_: next(answers))
        rc = main([
            "query", "--interactive",
            "--data", f"{reference_root}/extract_data", "--index", "",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert out.count("Q: ") == 5  # all five canned questions ran
        assert "15.22" in out  # the stdin question was answered
