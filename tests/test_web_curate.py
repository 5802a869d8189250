"""End-to-end web curation chain (pipelines/web.py): exact survivor set
over a crafted WARC, and the spans-safe semi-filter's two paths."""

import pandas as pd
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
class TestWebCurate:
    def _run(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __ray_entry__

        return (__ray_entry__.queries()["web_curate"]("unused")
                .to_pandas().sort_values("canonical", ignore_index=True))

    def test_exact_survivor_set(self):
        out = self._run()
        # 9 crawl records → 4 curated docs:
        #  - three /a URL variants collapse to ONE survivor (min doc_id)
        #  - robots disallows /private, keeps /public
        #  - the thin page misses the token floor
        #  - the PDF parses to real text; the image page has none
        assert out["canonical"].tolist() == [
            "http://blocked.example.net/public/page",
            "http://example.com/a",
            "http://example.com/b",
            "http://example.com/doc.pdf",
        ]
        a_row = out[out["canonical"] == "http://example.com/a"]
        assert a_row["doc_id"].iloc[0] == "http://EXAMPLE.com:80/a?utm_source=feed"
        assert (out["n_tokens"] >= 3).all()
        assert out["quality_keep"].all()
        assert (out["lang_detected"] == "en").all()

    def test_deterministic(self):
        a, b = self._run(), self._run()
        pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
class TestKeepIdsArrow:
    def _spans_ds(self, ids):
        import ray.data

        from pdf_parser_ray.schema import SPAN_STRUCT

        spans = [[{"kind": "text", "text": f"body {i}", "media_ref": "",
                   "offset": 0}] for i in ids]
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(ids, type=pa.string()),
            "spans": pa.array(spans, type=pa.list_(SPAN_STRUCT))})).repartition(3)

    def _ids_ds(self, ids):
        import ray.data

        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, type=pa.string())}))

    @pytest.mark.parametrize("limit", [2_000_000, 0])
    def test_both_paths_filter_and_keep_spans(self, limit):
        from pdf_parser_ray.pipelines.web import keep_ids_arrow

        ds = self._spans_ds([f"u{i}" for i in range(20)])
        keep = self._ids_ds(["u3", "u7", "u15", "absent"])
        out = keep_ids_arrow(ds, keep, broadcast_limit=limit).to_pandas()
        assert sorted(out["doc_id"]) == ["u15", "u3", "u7"]
        # the list<struct> payload survives the exchange intact
        got = {r["doc_id"]: r["spans"][0]["text"] for _, r in out.iterrows()}
        assert got == {"u3": "body u3", "u7": "body u7", "u15": "body u15"}

    def test_empty_keep_set(self):
        from pdf_parser_ray.pipelines.web import keep_ids_arrow

        ds = self._spans_ds(["a", "b"])
        out = keep_ids_arrow(ds, self._ids_ds([]),
                             broadcast_limit=10).to_pandas()
        assert len(out) == 0
