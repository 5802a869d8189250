"""Extension-surface (E1 plugin contract), M9 JSON persistence parity,
salted dedup equivalence, run summary."""

import json

import pyarrow as pa
import pytest

from pdf_parser_ray.functions.regex_extract import RegexFieldExtractor
from pdf_parser_ray.stages.plugin import PluginExtract, encode_fields_json


class TestJsonPersistParity:
    def test_ensure_ascii_false(self):
        # byte parity with extraction_repository.py:63 (test_database.py:241-263)
        s = encode_fields_json({"name": "José García", "note": "中文"})
        assert s == '{"name": "José García", "note": "中文"}'

    def test_nested_values_roundtrip(self):
        # reference test_database.py:274-290 "complex nested data"
        data = {"a": {"b": [1, None, True]}, "c": "x"}
        assert json.loads(encode_fields_json(data)) == data


class TestPluginContract:
    def test_regex_extractor_is_a_plugin(self, sample_text_content):
        # RegexFieldExtractor satisfies the reference DataExtractor contract
        stage = PluginExtract(RegexFieldExtractor())
        out = stage(pa.table({"text": [sample_text_content]}))
        fields = json.loads(out.column("fields_json").to_pylist()[0])
        assert fields["policy_number"] == "POL-123456"

    def test_custom_plugin(self):
        class Upper:
            def extract(self, text, fields=None):
                return {"upper": text.upper()}

        out = PluginExtract(Upper())(pa.table({"text": ["abc"]}))
        assert json.loads(out.column("fields_json").to_pylist()[0]) == {"upper": "ABC"}

    def test_raising_plugin_captured(self):
        class Bad:
            def extract(self, text, fields=None):
                raise RuntimeError("boom")

        out = PluginExtract(Bad())(pa.table({"text": ["abc", "def"]}))
        assert out.column("extract_error").to_pylist() == ["boom", "boom"]
        assert out.column("fields_json").to_pylist() == [None, None]


class TestSaltedDedup:
    def test_equals_unsalted(self, ray_session):
        import ray.data
        from pdf_parser_ray.stages.dedup import exact_dedup, exact_dedup_salted

        rows = [{"doc_id": i, "text": f"content {i % 7}"} for i in range(50)]
        ds = ray.data.from_items(rows)
        plain = exact_dedup(ds).to_pandas().sort_values("doc_id", ignore_index=True)
        ds2 = ray.data.from_items(rows)
        salted = exact_dedup_salted(ds2, num_salts=4).to_pandas().sort_values(
            "doc_id", ignore_index=True)
        assert plain["doc_id"].tolist() == salted["doc_id"].tolist()
        assert sorted(plain["doc_id"]) == list(range(7))


class TestRunSummary:
    def test_summarize(self, ray_session, corpus_sf0001, tmp_path):
        from pdf_parser_ray.pipelines.extraction import run_extraction
        from pdf_parser_ray.state.manifest import summarize_run

        out = str(tmp_path / "run")
        run_extraction(corpus_sf0001, out, byte_budget=4096, parse_concurrency=2)
        s = summarize_run(out)
        assert s["docs"] == 10
        assert s["partitions"] >= 2
        assert s["errors"] >= 1
        assert s["parser_versions"] == ["0.1.0"]
