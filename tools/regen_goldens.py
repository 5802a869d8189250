"""Regenerate the frozen golden span-sequence artifact (tests/golden/).

The golden is the single-process oracle's output over the sf0.001 synthetic
corpus — hand-verified once (FIXTURES.md §3: claim-form fields vs the
reference's recorded extraction, error buckets, span ordering), then locked.
`tests/test_golden.py` compares pipeline output against this FILE, so any
silent kernel drift fails loudly. Rerun this script ONLY after deliberately
changing extraction semantics, and re-verify the spot checks it prints.
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from pdf_parser_ray.sources.synth import generate_corpus  # noqa: E402
from pdf_parser_ray.stages.doc_parse import DocParse  # noqa: E402

OUT = "/root/repo/tests/golden/spans_sf0.001.parquet"
OUT_01 = "/root/repo/tests/golden/spans_sf0.01.parquet"


def main() -> None:
    out = DocParse()(generate_corpus(0.001))
    out = out.take(pc.sort_indices(out.column("doc_id")))
    pq.write_table(out, OUT)
    print(f"wrote {OUT}: {out.num_rows} docs")
    out01 = DocParse()(generate_corpus(0.01))
    out01 = out01.take(pc.sort_indices(out01.column("doc_id")))
    pq.write_table(out01, OUT_01)
    print(f"wrote {OUT_01}: {out01.num_rows} docs")
    # spot checks (must hold after any regeneration — FIXTURES.md goldens)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    claim = rows["doc-00000007"]
    assert claim["fields"] == {"customer_name": "Jan Kowalski",
                               "policy_number": "POL-789456123",
                               "claim_amount": "3,450.00"}, claim["fields"]
    assert "not a valid PDF" in rows["doc-00000001"]["error"]
    assert "too small" in rows["doc-00000002"]["error"]
    assert "Failed to extract text" in rows["doc-00000003"]["error"]
    assert rows["doc-00000004"]["page_errors"]
    assert rows["doc-00000006"]["fields"]["customer_name"] == "José García"
    assert rows["doc-00000007"]["file_hash"] == rows["doc-00000008"]["file_hash"]
    print("spot checks passed — goldens verified")


if __name__ == "__main__":
    main()
