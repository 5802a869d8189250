"""WARC source: record parsing, gzip members, HTTP stripping, and the
Ray path feeding the flagship extraction stage."""

import pytest

PAGES = [
    ("http://example.com/a", "<html><body><p>Alpha paragraph with enough "
     "words to count as main content for the extractor.</p></body></html>"),
    ("http://example.com/b", "<html><body><nav>menu</nav><p>Beta body text "
     "long enough to be treated as a real content block.</p></body></html>"),
    ("http://example.com/c", "<html><body><p>Gamma page content, also a "
     "full sentence of meaningful main text.</p></body></html>"),
]


class TestWarcParsing:
    def test_roundtrip_plain_and_gzip(self):
        from pdf_parser_ray.sources.warc import (build_warc, http_response_body,
                                                 iter_warc_records)

        for gz in (False, True):
            data = build_warc(PAGES, gzip_members=gz)
            recs = list(iter_warc_records(data))
            assert len(recs) == 3
            for (uri, html), (headers, block) in zip(PAGES, recs):
                assert headers["warc-type"] == "response"
                assert headers["warc-target-uri"] == uri
                assert http_response_body(block).decode() == html

    def test_non_response_records_and_junk_skipped(self):
        from pdf_parser_ray.sources.warc import build_warc, iter_warc_records

        info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
                b"\r\nabcd\r\n\r\n")
        data = info + b"JUNKJUNK" + build_warc(PAGES[:1])
        recs = list(iter_warc_records(data))
        assert [h["warc-type"] for h, _ in recs] == ["warcinfo", "response"]

    def test_body_without_http_envelope_passes_through(self):
        from pdf_parser_ray.sources.warc import http_response_body

        assert http_response_body(b"<html></html>") == b"<html></html>"


@pytest.mark.usefixtures("ray_session")
class TestWarcRayPath:
    def test_read_warc_feeds_doc_parse(self, tmp_path):
        from pdf_parser_ray.html import extract_main_content
        from pdf_parser_ray.sources.warc import build_warc, read_warc
        from pdf_parser_ray.stages.doc_parse import doc_parse_batch

        p = tmp_path / "crawl-00000.warc.gz"
        p.write_bytes(build_warc(PAGES, gzip_members=True))
        ds = read_warc(str(p))
        out = ds.map_batches(doc_parse_batch, batch_format="pyarrow").to_pandas()
        assert sorted(out["doc_id"]) == sorted(u for u, _ in PAGES)
        assert out["error"].isna().all()
        # span text equals a direct run of the HTML extractor on the html
        by_id = {r["doc_id"]: r for _, r in out.iterrows()}
        for uri, html in PAGES:
            got = [s["text"] for s in by_id[uri]["spans"] if s["kind"] == "text"]
            want = [sp.text for sp in extract_main_content(html)
                    if sp.kind == "text"]
            assert got == want


@pytest.mark.usefixtures("ray_session")
class TestWarcToCheckpointedExtraction:
    def test_warc_corpus_runs_resumable_extraction(self, tmp_path):
        import pandas as pd

        from pdf_parser_ray.pipelines.extraction import run_extraction
        from pdf_parser_ray.sources.warc import build_warc, warc_to_corpus

        warc = tmp_path / "crawl-00000.warc"
        warc.write_bytes(build_warc(PAGES))
        corpus = str(tmp_path / "corpus")
        out = str(tmp_path / "out")
        warc_to_corpus(str(warc), corpus)

        r1 = run_extraction(corpus, out)
        assert r1["partitions_committed_now"] >= 1
        # rerun resumes: everything already committed
        r2 = run_extraction(corpus, out)
        assert r2["partitions_committed_now"] == 0
        assert r2["partitions_skipped"] == r1["partitions_total"]
        import glob

        parts = sorted(glob.glob(f"{out}/partitions/*"))
        got = pd.concat([pd.read_parquet(p) for p in parts],
                        ignore_index=True)
        assert sorted(got["doc_id"]) == sorted(u for u, _ in PAGES)
        assert got["error"].isna().all()


class TestWarcMalformed:
    def test_negative_content_length_terminates(self):
        from pdf_parser_ray.sources.warc import build_warc, iter_warc_records

        bad = (b"X" * 100 + b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: -100\r\n\r\nbody")
        data = bad + build_warc(PAGES[:1])
        recs = list(iter_warc_records(data))  # must terminate
        assert [h["warc-type"] for h, _ in recs].count("response") == 2
        # the well-formed record after the malformed one still parses
        assert recs[-1][0]["warc-target-uri"] == PAGES[0][0]


@pytest.mark.usefixtures("ray_session")
class TestWarcInterleaved:
    def test_pdf_and_image_payloads_sniffed(self, tmp_path):
        from pdf_parser_ray.pdf import extract_page_texts
        from pdf_parser_ray.pdf.build import claim_form_pdf
        from pdf_parser_ray.sources.warc import build_warc, read_warc
        from pdf_parser_ray.stages.doc_parse import doc_parse_batch

        pdf_bytes = claim_form_pdf()
        png_stub = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
        pages = [
            ("http://e.com/page", PAGES[0][1]),
            ("http://e.com/doc.pdf", pdf_bytes, "application/pdf"),
            ("http://e.com/logo.png", png_stub, "image/png"),
        ]
        p = tmp_path / "mix.warc.gz"
        p.write_bytes(build_warc(pages, gzip_members=True))
        out = (read_warc(str(p))
               .map_batches(doc_parse_batch, batch_format="pyarrow")
               .to_pandas().set_index("doc_id"))
        assert out["error"].isna().all()
        # the PDF record round-trips through the real layout parser
        want_pages, _ = extract_page_texts(pdf_bytes)
        got = [s["text"] for s in out.loc["http://e.com/doc.pdf", "spans"]
               if s["kind"] == "text"]
        assert got == want_pages
        # the image record passes through as a media_ref pointer
        img = out.loc["http://e.com/logo.png", "spans"]
        assert [ (s["kind"], s["media_ref"]) for s in img ] == [
            ("image", "http://e.com/logo.png")]


class TestWarcSniffEdgeCases:
    def test_gzip_encoded_body_sniffed_after_decompress(self):
        import gzip as _gz

        from pdf_parser_ray.sources.warc import _classify_body

        pdf = b"%PDF-1.4 fake"
        span = _classify_body(_gz.compress(pdf), "http://x/doc.pdf")
        assert span["kind"] == "pdf"
        html = _classify_body(_gz.compress(b"<p>hi</p>"), "http://x/p")
        assert html["kind"] == "html" and html["text"] == "<p>hi</p>"

    def test_missing_target_uri_gets_record_id(self, ray_session, tmp_path):
        from pdf_parser_ray.sources.warc import read_warc

        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Record-ID: <urn:uuid:abc-1>\r\n"
               b"Content-Length: 11\r\n\r\n<p>x</p>\r\n\r\n")
        rec2 = rec.replace(b"abc-1", b"abc-2")
        p = tmp_path / "nouri.warc"
        p.write_bytes(rec + rec2)
        ids = sorted(read_warc(str(p)).to_pandas()["doc_id"])
        assert ids == ["<urn:uuid:abc-1>", "<urn:uuid:abc-2>"]


from hypothesis import given, settings, strategies as st


class TestWarcFuzz:
    @settings(max_examples=120, deadline=None)
    @given(st.binary(max_size=400))
    def test_scanner_total_on_arbitrary_bytes(self, data):
        """iter_warc_records must terminate without raising on ANY input."""
        from pdf_parser_ray.sources.warc import iter_warc_records

        for headers, block in iter_warc_records(data):
            assert isinstance(headers, dict) and isinstance(block, bytes)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.binary(max_size=60), max_size=4),
           st.binary(max_size=30))
    def test_scanner_total_on_warc_shaped_garbage(self, blocks, junk):
        """Adversarial shape: WARC/ anchors with random headers/lengths."""
        from pdf_parser_ray.sources.warc import iter_warc_records

        parts = []
        for i, b in enumerate(blocks):
            parts.append(b"WARC/1.0\r\nContent-Length: "
                         + str(len(b) - 5).encode() + b"\r\n\r\n" + b)
            parts.append(junk)
        data = b"".join(parts)
        list(iter_warc_records(data))  # must terminate, never raise

    @settings(max_examples=80, deadline=None)
    @given(st.binary(max_size=200))
    def test_gunzip_members_total(self, data):
        from pdf_parser_ray.sources.warc import _gunzip_members

        out = _gunzip_members(b"\x1f\x8b" + data)
        assert isinstance(out, bytes)

    @settings(max_examples=120, deadline=None)
    @given(st.text(max_size=300))
    def test_metadata_total_on_arbitrary_text(self, s):
        from pdf_parser_ray.html.extract import extract_metadata

        m = extract_metadata(s)
        assert set(m) == {"title", "description", "canonical"}
