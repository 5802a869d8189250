"""JSONL source/sink (sources/jsonl.py): normalization, synthesized ids,
gzip members, corpus conversion, round-trip."""

import gzip
import json
import os

import pytest


@pytest.mark.usefixtures("ray_session")
class TestReadJsonl:
    def _write(self, tmp_path, rows, name="part-0.jsonl", gz=False):
        p = os.path.join(tmp_path, name)
        data = "\n".join(json.dumps(r) for r in rows).encode()
        with open(p, "wb") as f:
            f.write(gzip.compress(data) if gz else data)
        return p

    def test_explicit_ids_and_keep_fields(self, ray_session, tmp_path):
        from pdf_parser_ray.sources.jsonl import read_jsonl

        rows = [{"doc_id": "a", "text": "alpha body", "lang": "en", "junk": 1},
                {"doc_id": "b", "text": "beta body", "lang": "fr", "junk": 2}]
        p = self._write(str(tmp_path), rows)
        out = read_jsonl([p], keep_fields=("lang",)).to_pandas()
        assert sorted(out.columns) == ["doc_id", "lang", "text"]  # junk pruned
        assert out.set_index("doc_id").loc["b", "lang"] == "fr"

    def test_synthesized_content_ids_are_idempotent(self, ray_session, tmp_path):
        import hashlib

        from pdf_parser_ray.sources.jsonl import read_jsonl

        rows = [{"text": "same text"}, {"text": "same text"},
                {"text": "other text"}]
        p = self._write(str(tmp_path), rows)
        out = read_jsonl([p]).to_pandas()
        want = hashlib.sha256(b"same text").hexdigest()[:32]
        assert (out["doc_id"] == want).sum() == 2  # content-addressed dup ids

    def test_gzip_member(self, ray_session, tmp_path):
        from pdf_parser_ray.sources.jsonl import read_jsonl

        rows = [{"doc_id": "g", "text": "gzipped body"}]
        p = self._write(str(tmp_path), rows, name="part-0.jsonl.gz", gz=True)
        out = read_jsonl([p]).to_pandas()
        assert out["text"].tolist() == ["gzipped body"]

    def test_missing_text_field_raises(self, ray_session, tmp_path):
        from pdf_parser_ray.sources.jsonl import read_jsonl

        p = self._write(str(tmp_path), [{"doc_id": "x", "body": "no text"}])
        with pytest.raises(Exception, match="text"):
            read_jsonl([p]).to_pandas()

    def test_corpus_conversion_feeds_doc_parse(self, ray_session, tmp_path):
        import ray.data

        from pdf_parser_ray.sources.jsonl import jsonl_to_corpus
        from pdf_parser_ray.stages.doc_parse import doc_parse_batch

        rows = [{"doc_id": "d1", "text": "hello corpus world"},
                {"doc_id": "d2", "text": "second document"}]
        p = self._write(str(tmp_path), rows)
        out_dir = str(tmp_path / "corpus")
        jsonl_to_corpus([p], out_dir)
        parsed = (ray.data.read_parquet(out_dir)
                  .map_batches(doc_parse_batch, batch_format="pyarrow")
                  .to_pandas().set_index("doc_id"))
        assert parsed.loc["d1", "spans"][0]["text"] == "hello corpus world"
        assert parsed["error"].isna().all()
        # small row groups: the byte-budget planner's indivisible unit
        import glob

        import pyarrow.parquet as pq

        f = glob.glob(os.path.join(out_dir, "*.parquet"))[0]
        md = pq.ParquetFile(f).metadata
        assert max(md.row_group(i).num_rows
                   for i in range(md.num_row_groups)) <= 32

    def test_write_round_trip(self, ray_session, tmp_path):
        import ray.data

        from pdf_parser_ray.sources.jsonl import read_jsonl, write_jsonl

        rows = [{"doc_id": str(i), "text": f"doc {i}"} for i in range(10)]
        p = self._write(str(tmp_path), rows)
        out_dir = str(tmp_path / "sink")
        write_jsonl(read_jsonl([p]), out_dir)
        back = read_jsonl(
            [os.path.join(out_dir, f) for f in os.listdir(out_dir)]
        ).to_pandas().sort_values("doc_id", ignore_index=True)
        assert back["text"].tolist() == [f"doc {i}" for i in range(10)]


@pytest.mark.usefixtures("ray_session")
class TestReadCsvDocs:
    def _write(self, tmp_path, text_rows, name="part-0.csv", header=True):
        import csv as _csv

        p = os.path.join(tmp_path, name)
        with open(p, "w", newline="") as f:
            w = _csv.writer(f)
            if header:
                w.writerow(["doc_id", "text", "lang"])
            w.writerows(text_rows)
        return p

    def test_quoted_multiline_round_trip(self, ray_session, tmp_path):
        from pdf_parser_ray.sources.jsonl import read_csv_docs

        nasty = 'line one\nline "two", with comma\n\ttab'
        p = self._write(str(tmp_path),
                        [["a", nasty, "en"], ["b", "", "fr"]])
        out = read_csv_docs([p], keep_fields=("lang",)).to_pandas()
        got = out.set_index("doc_id")
        assert got.loc["a", "text"] == nasty      # byte-exact through quoting
        assert got.loc["b", "text"] == ""          # empty string, not null
        assert got.loc["b", "lang"] == "fr"
        assert sorted(out.columns) == ["doc_id", "lang", "text"]

    def test_synthesized_ids_when_no_id_column(self, ray_session, tmp_path):
        import csv as _csv
        import hashlib

        from pdf_parser_ray.sources.jsonl import read_csv_docs

        p = os.path.join(str(tmp_path), "noid.csv")
        with open(p, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["text"])
            w.writerows([["same text"], ["same text"], ["other"]])
        out = read_csv_docs([p]).to_pandas()
        want = hashlib.sha256(b"same text").hexdigest()[:32]
        assert (out["doc_id"] == want).sum() == 2

    def test_integer_ids_cast_to_string(self, ray_session, tmp_path):
        from pdf_parser_ray.sources.jsonl import read_csv_docs

        p = self._write(str(tmp_path), [[7, "seven", "en"]])
        out = read_csv_docs([p]).to_pandas()
        assert out["doc_id"].tolist() == ["7"]

    def test_missing_text_field_raises(self, ray_session, tmp_path):
        import csv as _csv

        from pdf_parser_ray.sources.jsonl import read_csv_docs

        p = os.path.join(str(tmp_path), "notext.csv")
        with open(p, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["doc_id", "body"])
            w.writerow(["x", "no text col"])
        with pytest.raises(Exception, match="text"):
            read_csv_docs([p]).to_pandas()
