"""End-to-end web-corpus curation: the chain a crawl actually runs,
as ONE lazy Dataset pipeline.

    WARC files → payload-sniffed corpus rows (sources/warc.read_warc)
      → robots compliance filter (crawl-policy drop, stateless)
      → canonical-URL dedup (ids-only exchange; payload never shuffles
        in the dedup itself)
      → semi-join survivors back onto the corpus (the one exchange that
        moves spans, bucket-partitioned)
      → DocParse extraction (task-mode map_batches: PDF layout parse,
        HTML boilerplate strip, per-row fail-soft)
      → per-doc text features (language ID, quality heuristics, token
        counts) + canonical URL, short/failed docs dropped.

Every stage is an operator that is individually oracle- or pytest-gated
elsewhere; this module is the composition (the web sibling of
``__ray_entry__._q_corpus_curate``). The corpus never materializes —
only the slim survivor-id table does — but the WARC input is SCANNED
TWICE (the URL-dedup pass and the keep pass); for very large crawls run
``warc_to_corpus`` first and curate over the parquet (the documented
two-step), making each pass a cheap columnar read.

Reference parity: the reference app has no web tier (it ingests local
PDFs); this pipeline exists because the Ray engine's brief is the
100-TB web-scale corpus the reference never faces.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def keep_ids_arrow(ds, ids_ds, *, id_col: str = "doc_id",
                   broadcast_limit: int = 2_000_000, num_parts: int = 64):
    """Semi-filter ``ds`` to rows whose ``id_col`` appears in the slim
    ``ids_ds`` — WITHOUT the wide payload ever entering a pandas block
    (``spans`` is list<struct>: pandas round-trips turn it into object
    ndarrays Ray cannot convert back — the reason ``semi_anti_join``
    doesn't fit here). Below the gate the id set broadcasts once and the
    filter is a stateless Arrow map; above it both sides co-partition by
    a vectorized id hash and an ARROW ``map_groups`` kernel (``pc.is_in``)
    keeps every column in its native Arrow representation through the
    exchange."""
    import ray as _ray

    import pyarrow.compute as pc

    from ..schema import SPAN_STRUCT  # noqa: F401  (documented contract)
    from .relational import vec_str_buckets

    ids_slim = ids_ds.select_columns([id_col])
    n = ids_slim.count()
    if n <= broadcast_limit:
        idset: set = set()
        for b in ids_slim.iter_batches(batch_format="pyarrow"):
            idset.update(b.column(id_col).to_pylist())
        ids_ref = _ray.put(idset)

        def keep(batch: pa.Table) -> pa.Table:
            s = _ray.get(ids_ref)
            mask = [i in s for i in batch.column(id_col).to_pylist()]
            return batch.filter(pa.array(mask, type=pa.bool_()))

        return ds.map_batches(keep, batch_format="pyarrow")

    lschema = ds.schema()
    ltypes = dict(zip(lschema.names, lschema.types))

    def prep_left(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("wc_part", pa.array(
            vec_str_buckets(batch.column(id_col).to_pandas(), num_parts)))
        return batch.append_column(
            "wc_side", pa.array([0] * batch.num_rows, type=pa.int64()))

    def prep_right(batch: pa.Table) -> pa.Table:
        ids = pc.unique(batch.column(id_col))
        cols = {c: (ids if c == id_col else pa.nulls(len(ids), type=t))
                for c, t in ltypes.items()}
        t = pa.table(cols)
        t = t.append_column("wc_part", pa.array(
            vec_str_buckets(t.column(id_col).to_pandas(), num_parts)))
        return t.append_column(
            "wc_side", pa.array([1] * len(ids), type=pa.int64()))

    both = ds.map_batches(prep_left, batch_format="pyarrow").union(
        ids_slim.map_batches(prep_right, batch_format="pyarrow"))

    def semi(g: pa.Table) -> pa.Table:
        left = g.filter(pc.equal(g.column("wc_side"), 0))
        right_ids = pc.unique(
            g.filter(pc.equal(g.column("wc_side"), 1)).column(id_col))
        mask = pc.is_in(left.column(id_col), value_set=right_ids)
        return left.filter(mask).drop_columns(["wc_part", "wc_side"])

    return both.groupby("wc_part").map_groups(semi, batch_format="pyarrow")


def web_curate(warc_paths, robots_by_host: dict[str, str], *,
               min_tokens: int = 3, batch_size: int = 64):
    """Curated document-feature Dataset from raw WARC path(s).

    Output rows: (doc_id, canonical, lang_detected, n_tokens,
    alpha_ratio, quality_keep, n_spans) for every surviving document —
    robots-allowed, canonical-URL-unique, parsed without error, and at
    least ``min_tokens`` tokens long."""
    from ..functions import textstats
    from ..functions.url import canonical_url
    from ..sources.warc import dedup_warc_by_url, read_warc, robots_filter
    from ..stages.doc_parse import doc_parse_batch

    ds = read_warc(warc_paths)
    ds = robots_filter(ds, robots_by_host)
    # materialize the SLIM survivor ids once: keep_ids_arrow consumes them
    # twice (count + collect/partition), and each lazy consumption would
    # otherwise re-run the whole WARC scan behind them. The corpus itself
    # still streams — but note it IS scanned twice by design (once inside
    # the URL dedup, once for the keep pass); for very large crawls run
    # warc_to_corpus first and curate over the parquet (the documented
    # two-step), which makes every pass a cheap columnar read.
    survivors = dedup_warc_by_url(ds).materialize()
    kept = keep_ids_arrow(ds, survivors)
    parsed = kept.map_batches(doc_parse_batch, batch_format="pyarrow",
                              batch_size=batch_size)

    def featurize(df: pd.DataFrame) -> pd.DataFrame:
        texts = pd.Series(
            ["\n".join(s["text"] for s in (spans or []) if s["kind"] == "text")
             for spans in df["spans"]], index=df.index)
        q = textstats.quality_score(texts)
        out = pd.DataFrame({
            "doc_id": df["doc_id"],
            "canonical": [canonical_url(u) for u in df["doc_id"]],
            "lang_detected": textstats.detect_language(texts).to_numpy(),
            "n_tokens": q["n_tokens"].astype("int64").to_numpy(),
            "alpha_ratio": q["alpha_ratio"].to_numpy(),
            "quality_keep": q["quality_keep"].astype(bool).to_numpy(),
            "n_spans": df["n_spans"].astype("int64"),
        })
        ok = df["error"].isna().to_numpy() & (out["n_tokens"] >= min_tokens)
        return out.loc[ok]

    return parsed.map_batches(featurize, batch_format="pandas")
