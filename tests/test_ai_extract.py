"""AI-extractor parity stage: truncation limits, label filter, JSON-fish
parse, error capture — reference ai_extractor.py semantics, offline stub."""

import json

import pyarrow as pa
import pytest

from pdf_parser_ray.config import AI_DISCOVERY_TRUNCATE, AI_EXTRACT_TRUNCATE
from pdf_parser_ray.stages.ai_extract import (
    AIExtract,
    ModelClient,
    StubModel,
    filter_labels,
    parse_model_json,
)


class TestJsonFish:
    def test_json_embedded_in_prose(self):
        assert parse_model_json('bla {"a": 1} bla') == {"a": 1}

    def test_dotall_multiline(self):
        assert parse_model_json('x\n{\n "a": [1,2]\n}\ny') == {"a": [1, 2]}

    def test_no_json_raises(self):
        with pytest.raises(ValueError, match="No JSON object"):
            parse_model_json("nothing here")

    def test_non_dict_rejected(self):
        # reference test_extractors.py:399-437 non-dict rejection
        with pytest.raises((ValueError, json.JSONDecodeError)):
            parse_model_json("{invalid json}")


class TestLabelFilter:
    def test_length_gate(self):
        # keep 2 < len < 40 (ai_extractor.py:129-133)
        labels = ["ok_label", "ab", "x" * 40, "xyz"]
        assert filter_labels(labels) == ["ok_label", "xyz"]

    def test_cap_at_15(self):
        labels = [f"label_{i:02d}" for i in range(30)]
        assert len(filter_labels(labels)) == 15


class TestStubPipeline:
    def test_discover_and_extract(self, sample_text_content):
        stage = AIExtract()
        batch = pa.table({"text": [sample_text_content]})
        out = stage(batch)
        labels = out.column("ai_labels").to_pylist()[0]
        assert "customer_name" in labels and "policy_number" in labels
        fields = json.loads(out.column("ai_fields_json").to_pylist()[0])
        assert fields["customer_name"] == "John Smith"
        assert out.column("ai_error").to_pylist() == [None]

    def test_empty_text_error(self):
        out = AIExtract()(pa.table({"text": ["", "   "]}))
        assert out.column("ai_error").to_pylist() == [
            "No text content to process", "No text content to process"]

    def test_fixed_labels_skip_discovery(self, sample_text_content):
        stage = AIExtract(labels=["claim_amount"])
        out = stage(pa.table({"text": [sample_text_content]}))
        fields = json.loads(out.column("ai_fields_json").to_pylist()[0])
        assert list(fields) == ["claim_amount"]

    def test_broken_model_error_captured(self):
        class Broken(ModelClient):
            def complete(self, prompt: str) -> str:
                return "no json here at all"

        out = AIExtract(model=Broken())(pa.table({"text": ["some text"]}))
        assert out.column("ai_error").to_pylist()[0] is not None
        assert out.column("ai_fields_json").to_pylist() == [None]

    def test_truncation_limits_applied(self):
        seen = {}

        class Spy(ModelClient):
            def complete(self, prompt: str) -> str:
                if prompt.startswith("DISCOVER:"):
                    seen["discover"] = len(prompt) - len("DISCOVER:")
                    return "labels: some_label"
                seen["extract"] = len(prompt.split("\n", 1)[1])
                return "{}"

        big = "x" * 100_000
        AIExtract(model=Spy())(pa.table({"text": [big]}))
        assert seen["discover"] == AI_DISCOVERY_TRUNCATE
        assert seen["extract"] == AI_EXTRACT_TRUNCATE

    def test_unicode_preserved_in_json(self):
        # ensure_ascii=False parity (extraction_repository.py:63)
        out = AIExtract()(pa.table({"text": ["Customer Name: José García\nmore"]}))
        raw = out.column("ai_fields_json").to_pylist()[0]
        assert "José García" in raw  # not é-escaped

    def test_deterministic(self, sample_text_content):
        batch = pa.table({"text": [sample_text_content] * 3})
        a = AIExtract()(batch).column("ai_fields_json").to_pylist()
        b = AIExtract()(batch).column("ai_fields_json").to_pylist()
        assert a == b and len(set(a)) == 1


class TestUnderRay:
    def test_actor_pool(self, ray_session, sample_text_content):
        import ray.data

        ds = ray.data.from_items([{"text": sample_text_content}] * 20)
        out = ds.map_batches(AIExtract, batch_format="pyarrow", batch_size=8,
                             concurrency=2).to_pandas()
        assert len(out) == 20
        assert out["ai_error"].isna().all()
