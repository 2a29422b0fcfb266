"""Config system tests (C16 parity: env loading, validation, model switching)."""

import os

from ragfin_tpu.config.constants import validate_chunk_type, validate_quarter
from ragfin_tpu.config.settings import Settings, get_config, load_dotenv, switch_default_model


class TestSettings:
    def test_api_key_routing(self):
        s = Settings(gemini_api_key="g", openai_api_key="o", groq_api_key="q")
        assert s.get_api_key_for_model("gemini-2.0-flash") == "g"
        assert s.get_api_key_for_model("gpt-3.5-turbo") == "o"
        assert s.get_api_key_for_model("llama3.1:8b") == "q"
        assert s.get_api_key_for_model("fake") is None

    def test_model_dependent_timeout(self):
        s = Settings(base_timeout_s=10.0)
        assert s.get_timeout_for_model("llama3.1:8b") == 20.0  # local llama 2x
        assert s.get_timeout_for_model("gemini-2.0-flash") == 10.0
        s2 = Settings(base_timeout_s=10.0, groq_api_key="k")
        assert s2.get_timeout_for_model("llama3.1:8b") == 10.0  # hosted

    def test_validate_reports_issues(self):
        issues = Settings(default_model="nope").validate()
        assert any("unknown default_model" in i for i in issues)
        issues = Settings(default_model="gemini-2.0-flash").validate()
        assert any("no API key" in i for i in issues)
        assert Settings(default_model="fake").validate() == []

    def test_switch_default_model(self):
        old = os.environ.get("RAGFIN_MODEL")
        try:
            s = switch_default_model("gemini-2.0-flash")
            assert s.default_model == "gemini-2.0-flash"
            assert get_config().default_model == "gemini-2.0-flash"
        finally:
            if old is None:
                os.environ.pop("RAGFIN_MODEL", None)
            else:
                os.environ["RAGFIN_MODEL"] = old
            get_config.cache_clear()

    def test_dotenv_loader(self, tmp_path, monkeypatch):
        env_file = tmp_path / ".env"
        env_file.write_text("RAGFIN_TEST_KEY='hello'\n# comment\nBAD LINE\n")
        monkeypatch.delenv("RAGFIN_TEST_KEY", raising=False)
        load_dotenv(str(env_file))
        assert os.environ["RAGFIN_TEST_KEY"] == "hello"
        os.environ.pop("RAGFIN_TEST_KEY", None)


class TestConstants:
    def test_quarter_validation(self):
        assert validate_quarter("Q1_FY2024")
        assert not validate_quarter("Q5_FY2024")

    def test_chunk_type_validation(self):
        assert validate_chunk_type("segment_analysis")
        assert not validate_chunk_type("bogus")
