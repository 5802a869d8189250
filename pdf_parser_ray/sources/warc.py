"""From-scratch WARC (ISO 28500) source — stdlib only.

Web-archive inputs (Common-Crawl-style ``.warc`` / ``.warc.gz``) are the
native acquisition format for a web-scale extraction tier; this module
turns them into interleaved documents on the corpus schema
``(doc_id, spans)`` with one ``html`` span per response record, directly
consumable by the flagship ``DocParse`` stage.

Format notes (public spec): a WARC file is a sequence of records —
``WARC/1.0`` version line, CRLF header lines, blank line, then exactly
``Content-Length`` block bytes, then two CRLFs.  A ``response`` record's
block is a full HTTP response (status line + headers + CRLFCRLF + body).
``.warc.gz`` files compress EACH record as its own gzip member so
readers can split at member boundaries; stdlib zlib decompresses the
member chain via repeated ``decompressobj(wbits=31)``.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator

import pyarrow as pa


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a chain of concatenated gzip members."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(data[pos:])
            out += d.flush()
        except zlib.error:
            break  # trailing garbage: keep what decoded
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return bytes(out)


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, block)`` per WARC record.

    ``headers`` maps lower-cased field names to values.  The scan anchors
    on the ``WARC/`` version line and honors ``Content-Length``, so
    malformed regions between records are skipped (fail-soft, like every
    per-row parser in this repo)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    while True:
        idx = data.find(b"WARC/", pos)
        if idx < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", idx)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for ln in data[idx:hdr_end].split(b"\r\n")[1:]:
            key, sep, val = ln.partition(b":")
            if sep:
                headers[key.strip().lower().decode("latin-1")] = \
                    val.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        # clamp: a negative/absurd length in a malformed record must never
        # move the scan backwards (infinite re-yield) or to a negative
        # index (bytes.find treats it as from-the-end — silent data loss)
        length = max(length, 0)
        block = data[hdr_end + 4 : hdr_end + 4 + length]
        yield headers, block
        pos = hdr_end + 4 + length


def http_response_body(block: bytes) -> bytes:
    """Strip the HTTP envelope from a ``response`` record block (tolerant:
    a block without a status line passes through unchanged)."""
    if block[:5] == b"HTTP/":
        sep = block.find(b"\r\n\r\n")
        if sep >= 0:
            return block[sep + 4:]
    return block


def build_warc(pages, *, gzip_members: bool = False) -> bytes:
    """Fixture writer → WARC bytes of response records (deterministic —
    fixed date/ids).  Entries: ``(uri, html_str)`` or
    ``(uri, payload_bytes, content_type)`` for non-HTML payloads."""
    out = bytearray()
    for i, page in enumerate(pages):
        if len(page) == 2:
            uri, payload = page
            body, ctype = payload.encode("utf-8"), "text/html"
        else:
            uri, body, ctype = page
        http = (f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n".encode("ascii")
                + body)
        hdr = ("WARC/1.0\r\n"
               "WARC-Type: response\r\n"
               f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-{i:012d}>\r\n"
               "WARC-Date: 2026-01-01T00:00:00Z\r\n"
               f"WARC-Target-URI: {uri}\r\n"
               "Content-Type: application/http; msgtype=response\r\n"
               f"Content-Length: {len(http)}\r\n\r\n").encode("ascii")
        rec = hdr + http + b"\r\n\r\n"
        out += gzip.compress(rec) if gzip_members else rec
    return bytes(out)


_IMAGE_MAGIC = (b"\x89PNG\r\n\x1a\n", b"GIF87a", b"GIF89a", b"\xff\xd8\xff")


def _classify_body(body: bytes, uri: str) -> dict:
    """Payload sniffing by magic bytes → one span on the corpus schema.
    Web archives interleave media with pages; trusting Content-Type is
    famously wrong, so the BYTES decide: %PDF → a ``pdf`` span (base64
    text, the corpus encoding DocParse expects), image magic → an
    ``image`` span referencing the record URI, else an ``html`` span."""
    import base64

    if body[:2] == b"\x1f\x8b":
        # Content-Encoding: gzip bodies are common in real WARCs — the
        # magic-byte contract only holds on the DECOMPRESSED payload
        body = _gunzip_members(body) or body
    if body.startswith(b"%PDF"):
        return {"kind": "pdf",
                "text": base64.b64encode(body).decode("ascii"),
                "media_ref": "", "offset": 0}
    if body.startswith(_IMAGE_MAGIC):
        return {"kind": "image", "text": "", "media_ref": uri, "offset": 0}
    return {"kind": "html", "text": body.decode("utf-8", "replace"),
            "media_ref": "", "offset": 0}


def read_warc(paths, **ray_kwargs):
    """``ray.data.Dataset`` of INTERLEAVED documents from WARC file(s):
    one row per ``response`` record, ``doc_id`` = WARC-Target-URI, spans
    = [one sniffed span] (html page / pdf payload / image ref — see
    ``_classify_body``) on the corpus schema, so the result pipes
    straight into ``DocParse`` / ``extraction_dataset``.  Reads are
    streaming (``read_binary_files`` → per-batch record explode); a WARC
    file is the read-parallelism unit, matching how web archives
    shard."""
    import ray.data

    from ..schema import SPAN_STRUCT

    ds = ray.data.read_binary_files(paths, **ray_kwargs)

    def explode(batch: pa.Table) -> pa.Table:
        ids, spans = [], []
        for blob in batch.column("bytes").to_pylist():
            for headers, block in iter_warc_records(blob):
                if headers.get("warc-type") != "response":
                    continue
                # a record without a target URI still needs a UNIQUE id —
                # WARC-Record-ID is mandatory/unique; '' for N records
                # would make them indistinguishable (URL dedup would
                # collapse unrelated documents)
                uri = headers.get("warc-target-uri") or \
                    headers.get("warc-record-id", "")
                body = http_response_body(block)
                ids.append(uri)
                spans.append([_classify_body(body, uri)])
        return pa.table({"doc_id": pa.array(ids, type=pa.string()),
                         "spans": pa.array(spans,
                                           type=pa.list_(SPAN_STRUCT))})

    return ds.map_batches(explode, batch_format="pyarrow")


def warc_to_corpus(paths, out_dir: str, **ray_kwargs) -> None:
    """Materialize WARC input as the corpus parquet layout.

    The checkpointed extraction (``pipelines/extraction.run_extraction``)
    plans partitions from parquet row-group statistics, which WARC files
    don't carry — so web-archive ingestion is a two-step: this one
    streaming conversion pass (records → corpus rows → parquet shards),
    then the fragment-planned, exactly-resumable extraction over the
    result.  The conversion itself is restartable at file granularity
    (rerun with the not-yet-converted WARC paths)."""
    read_warc(paths, **ray_kwargs).write_parquet(out_dir)


def dedup_warc_by_url(ds, *, url_col: str = "doc_id", num_parts: int = 64,
                      nrows: int | None = None):
    """URL-level crawl dedup: canonicalize each record's URL
    (``functions/url.canonical_url`` — case/port/query-order/tracking/
    fragment variants collapse) and keep the min-id survivor per
    canonical form via the ids-only exact dedup (slim
    (id, hash, canonical) exchange, payload never shuffles).  Returns
    (url_col, content_hash=sha256(canonical), canonical) survivor rows —
    semi-join them back against the corpus to materialize surviving
    documents, exactly like ``exact_dedup_semi`` does for content dedup."""
    from ..functions.url import canonical_url
    from ..stages.dedup import exact_dedup_ids

    def canon(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        return pa.table({url_col: batch.column(url_col),
                         "canonical": pa.array(
                             [canonical_url(u) for u in urls],
                             type=pa.string())})

    slim = ds.map_batches(canon, batch_format="pyarrow")
    return exact_dedup_ids(slim, text_col="canonical", id_col=url_col,
                           keep_cols=("canonical",),
                           num_parts=num_parts, nrows=nrows)


def warc_metadata(ds):
    """Head-metadata table for a WARC-derived corpus: one row per doc
    with (doc_id, title, description, canonical) from its html span
    (``html.extract_metadata``) — the provenance fields a web corpus
    carries alongside the extracted text.  Stateless map, no shuffle."""
    from ..html import extract_metadata

    def meta(batch: pa.Table) -> pa.Table:
        ids, titles, descs, canons = [], [], [], []
        for i, spans in zip(batch.column("doc_id").to_pylist(),
                            batch.column("spans").to_pylist()):
            html = "".join(s["text"] or "" for s in spans
                           if s["kind"] == "html")
            m = extract_metadata(html)
            ids.append(i)
            titles.append(m["title"])
            descs.append(m["description"])
            canons.append(m["canonical"])
        return pa.table({"doc_id": pa.array(ids, type=pa.string()),
                         "title": pa.array(titles, type=pa.string()),
                         "description": pa.array(descs, type=pa.string()),
                         "canonical": pa.array(canons, type=pa.string())})

    return ds.map_batches(meta, batch_format="pyarrow")


def robots_filter(ds, robots_by_host: dict[str, str], *,
                  url_col: str = "doc_id", agent: str = "*"):
    """Drop rows whose URL is disallowed by its host's robots.txt — the
    crawl-compliance filter of a web pipeline.  ``robots_by_host`` maps
    hostname → robots.txt TEXT (fetched out of band; parsing is offline
    stdlib ``urllib.robotparser``).  The map ships once via ``ray.put``;
    each task lazily parses only the hosts its batch touches and caches
    the parser (hosts ≪ rows).  A host with no robots.txt entry is
    allowed (the crawl-world default)."""
    import ray as _ray

    from ..functions.url import url_host

    robots_ref = _ray.put(dict(robots_by_host))

    def keep_allowed(batch: pa.Table) -> pa.Table:
        from urllib.robotparser import RobotFileParser

        texts = _ray.get(robots_ref)
        parsers: dict[str, RobotFileParser | None] = {}
        keep = []
        for u in batch.column(url_col).to_pylist():
            host = url_host(u)
            if host not in parsers:
                txt = texts.get(host)
                if txt is None:
                    parsers[host] = None
                else:
                    p = RobotFileParser()
                    p.parse(txt.splitlines())
                    parsers[host] = p
            p = parsers[host]
            keep.append(p is None or p.can_fetch(agent, u))
        return batch.filter(pa.array(keep, type=pa.bool_()))

    return ds.map_batches(keep_allowed, batch_format="pyarrow")
