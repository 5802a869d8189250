"""Deterministic interleaved-corpus generator (FIXTURES.md §3).

Generates the `input_hint`-shaped table
(doc_id: string, spans: list<struct<kind,text,media_ref,offset>>)
with seeded skew, embedded golden payloads, and fixed-position error-path
documents. Seed-driven (`numpy.default_rng`), no wall clock → byte-stable
across runs, which is what makes the span-equality and resume tests exact.

Span kinds drawn with p = text:0.45 html:0.30 pdf:0.10 image:0.10 media:0.05.
Docs with ``i % 997 == 0`` carry a ~1000×-page PDF (straggler/byte-budget
fixture); docs with ``i % 503`` in the error buckets carry the FIXTURES.md
§2.5 error payloads.
"""

from __future__ import annotations

import base64
import functools
import hashlib
import os

import numpy as np
import pyarrow as pa

from ..schema import INPUT_SCHEMA
from ..pdf.build import (
    claim_form_pdf,
    corrupt_page_mix_pdf,
    minimal_pdf,
    no_text_pdf,
    not_a_pdf,
)

_VOCAB = (
    "the quick brown fox jumps over lazy dog forest river mountain valley "
    "storm cloud meadow stone bridge castle harbor lantern whisper journey "
    "morning evening shadow silver golden ancient modern quiet loud gentle "
    "fierce wander gather scatter remember forget discover explore build"
).split()

_NAMES = ["John Smith", "Anna Maria", "Carlos Vega", "Marie Curie", "Jan Nowak", "Li Wei"]

# §2.5 error buckets: i % 503 → payload class
_ERR_NOT_A_PDF = 1
_ERR_TOO_SMALL = 2
_ERR_NO_TEXT = 3
_ERR_BAD_PAGE_MIX = 4
_ERR_NO_FIELDS = 5
_ERR_UNICODE = 6
_ERR_DUP_A = 7
_ERR_DUP_B = 8
_ERR_TOO_LARGE = 9  # only materialized at sf >= 0.1 (50 MB payload)


@functools.lru_cache(maxsize=None)
def _golden_pdfs() -> dict[str, bytes]:
    return {
        "claim": claim_form_pdf(),
        "minimal": minimal_pdf(),
        "big": claim_form_pdf(repeat_pages=200),  # ~1000 pages: the skew doc
        "corrupt_mix": corrupt_page_mix_pdf(),
        "no_text": no_text_pdf(),
        "not_a_pdf": not_a_pdf(),
    }


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode("ascii")


# bump when generator output changes: the corpus_path disk cache key
# includes it, so stale /tmp caches can never leak across code versions
GENERATOR_VERSION = 2

_POOL_SIZE = 8192


@functools.lru_cache(maxsize=8)
def _sentence_pool(seed: int) -> tuple[list[str], np.ndarray]:
    """Seeded pool of sentences + cumulative char lengths (generation-speed
    optimization: per-doc filler samples pool slices instead of composing
    word-by-word; still fully deterministic)."""
    rng = np.random.default_rng([seed, 999_983])
    lengths = rng.integers(5, 13, size=_POOL_SIZE)
    sentences = []
    for n in lengths:
        words = rng.choice(len(_VOCAB), size=int(n))
        s = " ".join(_VOCAB[w] for w in words)
        sentences.append(s[0].upper() + s[1:] + ".")
    cum = np.cumsum(np.array([len(s) + 1 for s in sentences], dtype=np.int64))
    return sentences, cum


_ACTIVE_POOL_SEED = 42


def _sentence(rng: np.random.Generator) -> str:
    pool, _ = _sentence_pool(_ACTIVE_POOL_SEED)
    return pool[int(rng.integers(0, _POOL_SIZE))]


def _filler(rng: np.random.Generator, approx_chars: int) -> str:
    pool, cum = _sentence_pool(_ACTIVE_POOL_SEED)
    start = int(rng.integers(0, _POOL_SIZE // 2))
    base = cum[start - 1] if start > 0 else 0
    # first index where cumulative chars from `start` reaches approx_chars
    end = int(np.searchsorted(cum, base + approx_chars)) + 1
    return " ".join(pool[start:min(end, _POOL_SIZE)])


def _field_block(rng: np.random.Generator) -> str:
    name = _NAMES[int(rng.integers(0, len(_NAMES)))]
    policy = f"POL-{int(rng.integers(100000, 999999))}"
    amount = f"{int(rng.integers(1, 9))},{int(rng.integers(100, 999))}.{int(rng.integers(10, 99))}"
    return (
        f"Customer Name: {name}\n"
        f"Policy Number: {policy}\n"
        f"Claim Amount: ${amount}\n"
        f"Date: 2024-01-01"
    )


def _html_page(rng: np.random.Generator, doc_id: str, offset: int, approx_chars: int) -> str:
    n_paras = max(1, approx_chars // 220)
    paras = []
    for _ in range(min(n_paras, 12)):
        body = _filler(rng, 180)
        paras.append(f"<p>{body}</p>")
        if rng.random() < 0.15:
            paras.append(f'<img src="media://{doc_id}/{offset}/img{len(paras)}">')
    nav = " ".join(f'<a href="/p{i}">Menu item {i}</a>' for i in range(4))
    return (
        "<!DOCTYPE html><html><head><title>Synth Page</title>"
        "<style>body{margin:0}</style></head><body>"
        f"<header><h1>Synth Site</h1><nav>{nav}</nav></header>"
        f'<div class="content"><h1>{_sentence(rng)}</h1>' + "".join(paras) + "</div>"
        f"<aside><p>{_filler(rng, 60)}</p></aside>"
        f"<footer><p>Copyright 2024 Synth Site. All rights reserved.</p></footer>"
        "</body></html>"
    )


DEFAULT_KIND_WEIGHTS = (0.45, 0.30, 0.10, 0.10, 0.05)  # text html pdf image media
# Extraction-heavy mix for benchmarking: the engine's work is PDF layout
# parse + HTML boilerplate strip (north star), so the bench corpus weights
# those kinds instead of pass-through text.
EXTRACTION_KIND_WEIGHTS = (0.15, 0.35, 0.40, 0.07, 0.03)


def _normal_doc_spans(rng: np.random.Generator, doc_id: str,
                      kind_weights: tuple = DEFAULT_KIND_WEIGHTS) -> list[dict]:
    n_spans = 1 + min(int(rng.poisson(3)), 11)
    approx_chars = int(np.exp(rng.normal(8.0, 1.5)))
    approx_chars = min(max(approx_chars, 64), 200_000)
    per_span = max(64, approx_chars // n_spans)
    spans = []
    kinds = rng.choice(5, size=n_spans, p=list(kind_weights))
    for offset in range(n_spans):
        kind = ("text", "html", "pdf", "image", "media")[int(kinds[offset])]
        if kind == "text":
            text = _filler(rng, per_span)
            if rng.random() < 0.10:
                text = text + "\n" + _field_block(rng)
            spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
        elif kind == "html":
            spans.append(
                {"kind": "html", "text": _html_page(rng, doc_id, offset, per_span),
                 "media_ref": "", "offset": offset}
            )
        elif kind == "pdf":
            which = "claim" if rng.random() < 0.5 else "minimal"
            spans.append(
                {"kind": "pdf", "text": _b64(_golden_pdfs()[which]), "media_ref": "", "offset": offset}
            )
        else:  # image / media
            spans.append(
                {"kind": kind, "text": "", "media_ref": f"media://{doc_id}/{offset}", "offset": offset}
            )
    return spans


def _error_doc_spans(bucket: int, rng: np.random.Generator, doc_id: str, sf: float) -> list[dict] | None:
    g = _golden_pdfs()
    if bucket == _ERR_NOT_A_PDF:
        payload = _b64(g["not_a_pdf"])
    elif bucket == _ERR_TOO_SMALL:
        payload = _b64(b"%PDF-1.4 tiny")  # 13 bytes < MIN_FILE_SIZE
    elif bucket == _ERR_NO_TEXT:
        payload = _b64(g["no_text"])
    elif bucket == _ERR_BAD_PAGE_MIX:
        payload = _b64(g["corrupt_mix"])
    elif bucket == _ERR_NO_FIELDS:
        return [{"kind": "text", "text": "This text does not contain the expected patterns",
                 "media_ref": "", "offset": 0}]
    elif bucket == _ERR_UNICODE:
        return [{"kind": "text",
                 "text": "Customer Name: José García\nNotes: àáâãäåæçèéêë ñ ü ß 中文 русский",
                 "media_ref": "", "offset": 0}]
    elif bucket in (_ERR_DUP_A, _ERR_DUP_B):
        return [{"kind": "pdf", "text": _b64(g["claim"]), "media_ref": "", "offset": 0}]
    elif bucket == _ERR_TOO_LARGE and sf >= 0.1 and doc_id == "doc-00000009":
        # one genuinely-oversized doc per corpus (FIXTURES.md §2.5 "at least
        # once") — NOT one per 503 docs: a 50 MB inline payload costs ~100 MB
        # of object-store traffic per occurrence and would dominate the bench
        # volume while only exercising the size-validation branch.
        big = b"%PDF-1.4\n%" + b"\x00" * (50 * 1024 * 1024)  # > MAX_FILE_SIZE
        return [{"kind": "pdf", "text": _b64(big), "media_ref": "", "offset": 0}]
    else:
        return None
    return [{"kind": "pdf", "text": payload, "media_ref": "", "offset": 0}]


def generate_corpus(sf: float, seed: int = 42,
                    kind_weights: tuple = DEFAULT_KIND_WEIGHTS) -> pa.Table:
    """Synthesize the interleaved corpus at scale factor ``sf``
    (n_docs = round(10_000 * sf), FIXTURES.md §3)."""
    global _ACTIVE_POOL_SEED
    _ACTIVE_POOL_SEED = seed
    n_docs = max(1, round(10_000 * sf))
    doc_ids: list[str] = []
    all_spans: list[list[dict]] = []
    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        # per-doc child RNG → order-independent determinism
        rng = np.random.default_rng([seed, i])
        if i % 997 == 0 and i > 0:
            spans = [{"kind": "pdf", "text": _b64(_golden_pdfs()["big"]),
                      "media_ref": "", "offset": 0}]
        else:
            spans = _error_doc_spans(i % 503, rng, doc_id, sf) if i % 503 in range(1, 10) else None
            if spans is None:
                spans = _normal_doc_spans(rng, doc_id, kind_weights)
        doc_ids.append(doc_id)
        all_spans.append(spans)
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": all_spans}, schema=INPUT_SCHEMA
    )


def corpus_path(sf: float, base_dir: str = "/tmp/pdf_parser_ray_corpus", seed: int = 42,
                docs_per_file: int = 500,
                kind_weights: tuple = DEFAULT_KIND_WEIGHTS,
                tag: str = "") -> str:
    """Generate-once cache of the synthesized corpus on local disk.

    Written as a DIRECTORY of part files (one per ``docs_per_file`` docs) —
    file count is the read-stage parallelism floor, and the resumable-input
    layout the manifest's lineage records point into.
    """
    from .io import write_corpus_table

    # cache key must cover EVERY generation parameter — kind_weights /
    # docs_per_file with the default tag previously aliased to a stale corpus
    # "rg-isolate" bumps the cache key for the round-4 writer change
    # (oversized rows get their own row group) — content is identical,
    # but the planning-relevant footer layout differs
    gen_key = hashlib.md5(
        repr((kind_weights, docs_per_file, "rg-isolate")).encode()).hexdigest()[:8]
    path = os.path.join(base_dir, f"v{GENERATOR_VERSION}_sf{sf}_seed{seed}_g{gen_key}{tag}")
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        os.makedirs(base_dir, exist_ok=True)
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        table = generate_corpus(sf, seed, kind_weights)
        n = table.num_rows
        part = 0
        for start in range(0, n, docs_per_file):
            chunk = table.slice(start, docs_per_file)
            # deep-copy the slice so each part file holds only its own rows
            chunk = chunk.combine_chunks()
            write_corpus_table(chunk, os.path.join(tmp, f"part-{part:05d}.parquet"))
            part += 1
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        os.replace(tmp, path)
    return path
