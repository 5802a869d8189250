"""Vectorized text-analysis stages over a plain ``text`` column.

Stateless pandas-batch functions (cheap, elastic tasks) — each adds columns
and is designed so a DuckDB oracle can reproduce the values exactly
(functions/textstats.py docstring).
"""

from __future__ import annotations

import pandas as pd

from ..functions import textstats


def add_token_counts(batch: pd.DataFrame, *, text_col: str = "text") -> pd.DataFrame:
    batch["n_tokens"] = textstats.token_count(batch[text_col])
    batch["n_tokens_bpe"] = textstats.bpe_ish_token_count(batch[text_col])
    return batch


def add_quality(batch: pd.DataFrame, *, text_col: str = "text") -> pd.DataFrame:
    q = textstats.quality_score(batch[text_col])
    for col in q.columns:
        batch[col] = q[col].to_numpy()
    return batch


def add_language(batch: pd.DataFrame, *, text_col: str = "text") -> pd.DataFrame:
    batch["lang_detected"] = textstats.detect_language(batch[text_col]).to_numpy()
    return batch


def _resolve_id_type(ds, id_col: str, id_type=None):
    """Arrow type of ``id_col``. Pass ``id_type`` explicitly when ``ds`` is
    a non-trivial LAZY pipeline: ``Dataset.schema()`` EXECUTES the upstream
    to sample it (the same trap hash_join's left_types/right_types guards
    against); on a bare read it is metadata-only and the default is fine."""
    if id_type is not None:
        return id_type
    return dict(zip(ds.schema().names, ds.schema().types))[id_col]


class Fingerprint:
    """Winnowing fingerprint stage (per-doc rolling-hash sketch).

    Callable class → actor pool; the kernel is per-row but C-speed numpy.
    """

    def __init__(self, k: int = 8, window: int = 16, text_col: str = "text"):
        self.k, self.window, self.text_col = k, window, text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["fingerprint"] = [
            textstats.doc_fingerprint_hex(t or "", self.k, self.window)
            for t in batch[self.text_col]
        ]
        return batch


def bm25_score(ds, *, terms: list[str], text_col: str = "text",
               id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
               id_type=None):
    """Distributed BM25 relevance scoring (Robertson–Spärck Jones / Okapi,
    public algorithm) of every document against a fixed term list — the
    relevance-filtering primitive of training-data curation.

    Two passes, no shuffle at all:
      pass A emits ONE slim partial row per batch (n_docs, Σ doc_len, and
      per-term document frequencies as a list column); the driver folds
      the ≤ n_blocks partials into (N, avgdl, idf_t) — a bounded scalar
      collect, not a data collect. Pass B scores each doc vectorized
      against those few floats shipped in the task closure (no broadcast
      object needed at this size).

    idf = ln((N - df + 0.5) / (df + 0.5) + 1)  (the non-negative variant);
    score = Σ_t idf_t · tf/(tf + k1·(1 − b + b·dl/avgdl)), accumulated in
    term order so the float sum is reproducible left-to-right by the SQL
    oracle. Tokenization is lowercased ASCII-``\\s+`` split (matches the
    oracle's lower() + regexp split). Output: (id_col, dl, score_milli)
    with DuckDB-style half-away-from-zero milli rounding.
    """
    import math

    import numpy as np
    import pyarrow as pa

    from ..functions.minhash import _ASCII_WS

    # document tokens are lowercased below, so match terms in the same
    # case-space — a mixed-case query term would otherwise silently score 0
    terms = [t.lower() for t in terms]

    def _toks(t: str) -> list[str]:
        return [x for x in _ASCII_WS.split((t or "").lower()) if x]

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n, sum_dl = 0, 0
        df = [0] * len(terms)
        for t in texts:
            toks = _toks(t)
            n += 1
            sum_dl += len(toks)
            tokset = set(toks)
            for j, term in enumerate(terms):
                if term in tokset:
                    df[j] += 1
        return pa.table({"n_docs": pa.array([n], type=pa.int64()),
                         "sum_dl": pa.array([sum_dl], type=pa.int64()),
                         "df": pa.array([df], type=pa.list_(pa.int64()))})

    n_total, sum_dl_total = 0, 0
    df_total = np.zeros(len(terms), dtype=np.int64)
    for part in ds.map_batches(partials, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        n_total += sum(part.column("n_docs").to_pylist())
        sum_dl_total += sum(part.column("sum_dl").to_pylist())
        for row in part.column("df").to_pylist():
            df_total += np.asarray(row, dtype=np.int64)

    # all-empty corpus: avgdl=1 keeps the denominator finite instead of
    # raising ZeroDivisionError; tf is 0 everywhere so every score is 0.0
    # (degenerate case — the SQL oracle only sees non-empty corpora)
    avgdl = (sum_dl_total / n_total) if sum_dl_total else 1.0
    idf = [math.log((n_total - int(d) + 0.5) / (int(d) + 0.5) + 1.0)
           for d in df_total]

    id_type = _resolve_id_type(ds, id_col, id_type)

    def score(batch: pa.Table) -> pa.Table:
        ids, dls, millis = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = _toks(t)
            dl = len(toks)
            s = 0.0
            for term, w in zip(terms, idf):  # fixed order: SQL-reproducible
                tf = toks.count(term)
                s += w * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
            ids.append(i)
            dls.append(dl)
            # DuckDB round(): half away from zero
            millis.append(int(math.copysign(math.floor(abs(s) * 1000 + 0.5), s)))
        return pa.table({id_col: pa.array(ids, type=id_type),
                         "dl": pa.array(dls, type=pa.int64()),
                         "score_milli": pa.array(millis, type=pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def pack_sequences(ds, *, seq_len: int = 512, text_col: str = "text",
                   id_col: str = "doc_id", bucket_size: int = 1 << 14,
                   id_type=None):
    """Sequence packing (concat-and-chunk): lay every document's tokens
    end-to-end in ``id_col`` order and cut fixed ``seq_len`` context
    windows — the training-data packing step that turns a corpus into
    equal-length model inputs. Emits per doc: its global token offset and
    the first/last sequence indices it lands in.

    Distributed exact prefix sum with NO data shuffle: pass A ships one
    slim (bucket = id // bucket_size, Σ tokens) partial per batch; the
    driver folds the ≤ n_buckets sums into exclusive bucket offsets
    (bounded scalar state). Pass B co-locates only the slim
    (id, n_tokens) pairs per bucket (ids-only exchange, the house
    pattern), local-cumsums each bucket in id order, and adds its bucket
    offset. Requires an integer ``id_col`` (the pack order); raises
    loudly otherwise.

    Output: (id_col, n_tokens, token_offset, first_seq, last_seq) —
    first_seq = offset // seq_len; last_seq covers the doc's final token
    (zero-token docs get first_seq = last_seq = offset // seq_len).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions import textstats

    id_type = _resolve_id_type(ds, id_col, id_type)
    if not pa.types.is_integer(id_type):
        raise TypeError(f"pack_sequences needs an integer {id_col!r} to "
                        f"define the pack order, got {id_type}")

    def slim_counts(batch: pa.Table) -> pa.Table:
        n = textstats.token_count(batch.column(text_col).to_pandas())
        ids = batch.column(id_col)
        # ids are non-negative, so trunc-division == floor-division
        bucket = pc.divide(pc.cast(ids, pa.int64()), bucket_size)
        return pa.table({
            id_col: ids,
            "n_tokens": pa.array(n.to_numpy(), type=pa.int64()),
            "pack_bucket": bucket,
        })

    slim = ds.map_batches(slim_counts, batch_format="pyarrow").materialize()

    # driver fold: ≤ n_buckets rows (bounded), never per-doc state
    bucket_sums: dict[int, int] = {}
    for part in slim.map_batches(
            lambda b: b.group_by("pack_bucket").aggregate([("n_tokens", "sum")]),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for bk, s in zip(part.column("pack_bucket").to_pylist(),
                         part.column("n_tokens_sum").to_pylist()):
            bucket_sums[int(bk)] = bucket_sums.get(int(bk), 0) + int(s)
    offsets: dict[int, int] = {}
    acc = 0
    for bk in sorted(bucket_sums):
        offsets[bk] = acc
        acc += bucket_sums[bk]

    def per_bucket(g):
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        base = offsets.get(int(g["pack_bucket"].iloc[0]), 0)
        off = base + g["n_tokens"].cumsum().shift(1, fill_value=0).astype("int64")
        n = g["n_tokens"].astype("int64")
        first = off // seq_len
        last = ((off + (n - 1).clip(lower=0)) // seq_len).where(n > 0, first)
        out = g[[id_col]].copy()
        out["n_tokens"] = n
        out["token_offset"] = off
        out["first_seq"] = first.astype("int64")
        out["last_seq"] = last.astype("int64")
        return out

    from ..pipelines.relational import coarse_partition_apply

    # kernel is NOT partition-shape-independent across buckets (each bucket
    # needs its own base), so group strictly by pack_bucket — but sort by
    # real bucket inside, so one coarse partition may carry many buckets:
    def kernel(g):
        import pandas as pd_
        return pd_.concat([per_bucket(sub) for _, sub in
                           g.groupby("pack_bucket", sort=True)],
                          ignore_index=True)

    return coarse_partition_apply(slim, kernel, key_col="pack_bucket",
                                  part_col="pack_part", num_parts=64,
                                  nrows=slim.count())


def _repetition_signals(texts, max_dup_bigram_milli: int,
                        min_distinct_token_milli: int,
                        max_top_bigram_milli: int):
    """Shared per-doc repetition computation for ``repetition_stats`` and
    ``repetition_filter`` — a single source of truth so the filter can
    never drift from the oracle-gated stats."""
    import collections

    from ..functions.minhash import _ASCII_WS

    n_tok, ttr, dup_bg, top_bg, keep = [], [], [], [], []
    for t in texts:
        toks = [x for x in _ASCII_WS.split((t or "").lower()) if x]
        n = len(toks)
        n_tok.append(n)
        ttr.append(1000 * len(set(toks)) // n if n else 0)
        if n >= 2:
            cnt = collections.Counter(zip(toks, toks[1:]))
            n_bg = n - 1
            dup_bg.append(1000 * (n_bg - len(cnt)) // n_bg)
            top_bg.append(1000 * max(cnt.values()) // n_bg)
        else:
            dup_bg.append(0)
            top_bg.append(0)
        keep.append(dup_bg[-1] <= max_dup_bigram_milli
                    and ttr[-1] >= min_distinct_token_milli
                    and top_bg[-1] <= max_top_bigram_milli)
    return n_tok, ttr, dup_bg, top_bg, keep


def repetition_filter(ds, *, text_col: str = "text",
                      max_dup_bigram_milli: int = 50,
                      min_distinct_token_milli: int = 400,
                      max_top_bigram_milli: int = 60):
    """Filter form of ``repetition_stats``: keep only rows passing all
    three repetition thresholds, preserving every input column. Same
    stateless no-shuffle shape; same kernel (``_repetition_signals``)."""
    import pyarrow as pa

    def kernel(batch: pa.Table) -> pa.Table:
        *_, keep = _repetition_signals(
            batch.column(text_col).to_pylist(),
            max_dup_bigram_milli, min_distinct_token_milli,
            max_top_bigram_milli)
        return batch.filter(pa.array(keep))

    return ds.map_batches(kernel, batch_format="pyarrow")


def repetition_stats(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     max_dup_bigram_milli: int = 50,
                     min_distinct_token_milli: int = 400,
                     max_top_bigram_milli: int = 60, id_type=None):
    """Gopher-style repetition quality signals per document (Rae et al.
    2021, "Scaling Language Models" §A1.1 repetition filters — public
    method), as exact integers so a DuckDB oracle replays them bit-for-bit:

      n_tokens              lowercased ASCII-whitespace token count
      distinct_token_milli  1000·distinct/total tokens (type-token ratio)
      dup_bigram_milli      1000·(duplicate bigram occurrences)/bigrams
      top_bigram_milli      1000·(most frequent bigram count)/bigrams
      repetition_keep       all three thresholds pass

    Docs with < 2 tokens have no bigrams: both bigram ratios are 0 (and
    so never trip the bigram thresholds). Embarrassingly parallel — one
    stateless ``map_batches`` pass, no shuffle at any scale; the per-doc
    Counter is the hot loop but each doc is touched exactly once.
    """
    import pyarrow as pa

    id_type = _resolve_id_type(ds, id_col, id_type)

    def kernel(batch: pa.Table) -> pa.Table:
        n_tok, ttr, dup_bg, top_bg, keep = _repetition_signals(
            batch.column(text_col).to_pylist(),
            max_dup_bigram_milli, min_distinct_token_milli,
            max_top_bigram_milli)
        return pa.table({
            id_col: batch.column(id_col).cast(id_type),
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "distinct_token_milli": pa.array(ttr, type=pa.int64()),
            "dup_bigram_milli": pa.array(dup_bg, type=pa.int64()),
            "top_bigram_milli": pa.array(top_bg, type=pa.int64()),
            "repetition_keep": pa.array(keep, type=pa.bool_()),
        })

    return ds.map_batches(kernel, batch_format="pyarrow")


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_signals(texts, *, min_words, max_words, min_mean_word_len_milli,
                    max_mean_word_len_milli, max_symbol_word_milli,
                    max_bullet_line_milli, max_ellipsis_line_milli,
                    min_alpha_word_milli, min_stop_hits):
    """Shared per-doc Gopher quality computation for ``gopher_quality``
    and ``gopher_filter`` — one source of truth so the filter can never
    drift from the oracle-gated stats."""
    from ..functions.minhash import _ASCII_WS

    n_w, mwl, sym, bul, ell, alp, sth, keep = [], [], [], [], [], [], [], []
    for t in texts:
        t = t or ""
        toks = [x for x in _ASCII_WS.split(t) if x]
        n = len(toks)
        n_w.append(n)
        if n:
            mwl.append(1000 * sum(len(w) for w in toks) // n)
            sym.append(1000 * (t.count("#") + t.count("...")) // n)
            alp.append(1000 * sum(
                1 for w in toks
                if any("a" <= c <= "z" or "A" <= c <= "Z" for c in w)
            ) // n)
        else:
            mwl.append(0)
            sym.append(0)
            alp.append(0)
        lines = t.split("\n")
        nl = len(lines)
        bul.append(1000 * sum(
            1 for L in lines if L.startswith(("-", "*", "•"))) // nl)
        ell.append(1000 * sum(1 for L in lines if L.endswith("...")) // nl)
        tokset = {w.lower() for w in toks}
        hits = sum(1 for s in _GOPHER_STOPWORDS if s in tokset)
        sth.append(hits)
        keep.append(min_words <= n <= max_words
                    and min_mean_word_len_milli <= mwl[-1]
                    <= max_mean_word_len_milli
                    and sym[-1] <= max_symbol_word_milli
                    and bul[-1] <= max_bullet_line_milli
                    and ell[-1] <= max_ellipsis_line_milli
                    and alp[-1] >= min_alpha_word_milli
                    and hits >= min_stop_hits)
    return n_w, mwl, sym, bul, ell, alp, sth, keep


def gopher_filter(ds, *, text_col: str = "text", **thresholds):
    """Filter form of ``gopher_quality``: keep only rows passing every
    Gopher rule, preserving every input column. Same stateless
    no-shuffle shape; same kernel (``_gopher_signals``)."""
    import pyarrow as pa

    kw = dict(min_words=50, max_words=100_000,
              min_mean_word_len_milli=3000, max_mean_word_len_milli=10_000,
              max_symbol_word_milli=100, max_bullet_line_milli=900,
              max_ellipsis_line_milli=300, min_alpha_word_milli=800,
              min_stop_hits=2)
    kw.update(thresholds)

    def kernel(batch: pa.Table) -> pa.Table:
        *_, keep = _gopher_signals(batch.column(text_col).to_pylist(), **kw)
        return batch.filter(pa.array(keep))

    return ds.map_batches(kernel, batch_format="pyarrow")


def gopher_quality(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len_milli: int = 3000,
                   max_mean_word_len_milli: int = 10_000,
                   max_symbol_word_milli: int = 100,
                   max_bullet_line_milli: int = 900,
                   max_ellipsis_line_milli: int = 300,
                   min_alpha_word_milli: int = 800,
                   min_stop_hits: int = 2, id_type=None):
    """Gopher quality-filter signals per document — the NON-repetition
    rules of Rae et al. 2021 §A1.1 (public method; the repetition rules
    live in ``repetition_stats``), as exact integers so a DuckDB oracle
    replays them bit-for-bit:

      n_words               ASCII-whitespace token count (raw text — no
                            lowercasing, so codepoint lengths are stable)
      mean_word_len_milli   1000·Σlen(word) // n_words   (codepoints)
      symbol_word_milli     1000·(#'#' + #'...') // n_words  (ellipsis
                            counted non-overlapping, as str.count does)
      bullet_line_milli     1000·(lines starting '-' '*' '•') // n_lines
      ellipsis_line_milli   1000·(lines ending '...') // n_lines
      alpha_word_milli      1000·(words containing [a-zA-Z]) // n_words
      stop_hits             how many of the 8 Gopher stopwords (the, be,
                            to, of, and, that, have, with) appear as
                            lowercased tokens
      gopher_keep           all thresholds pass (Gopher's defaults)

    Lines split on '\\n'; empty text is one empty line (both engines
    agree). Zero-word docs score 0 on every word ratio and never keep.
    Embarrassingly parallel: one stateless ``map_batches`` pass, no
    shuffle at any scale — the same shape as ``repetition_stats``.
    """
    import pyarrow as pa

    id_type = _resolve_id_type(ds, id_col, id_type)
    kw = dict(min_words=min_words, max_words=max_words,
              min_mean_word_len_milli=min_mean_word_len_milli,
              max_mean_word_len_milli=max_mean_word_len_milli,
              max_symbol_word_milli=max_symbol_word_milli,
              max_bullet_line_milli=max_bullet_line_milli,
              max_ellipsis_line_milli=max_ellipsis_line_milli,
              min_alpha_word_milli=min_alpha_word_milli,
              min_stop_hits=min_stop_hits)

    def kernel(batch: pa.Table) -> pa.Table:
        n_w, mwl, sym, bul, ell, alp, sth, keep = _gopher_signals(
            batch.column(text_col).to_pylist(), **kw)
        i64 = pa.int64()
        return pa.table({
            id_col: batch.column(id_col).cast(id_type),
            "n_words": pa.array(n_w, type=i64),
            "mean_word_len_milli": pa.array(mwl, type=i64),
            "symbol_word_milli": pa.array(sym, type=i64),
            "bullet_line_milli": pa.array(bul, type=i64),
            "ellipsis_line_milli": pa.array(ell, type=i64),
            "alpha_word_milli": pa.array(alp, type=i64),
            "stop_hits": pa.array(sth, type=i64),
            "gopher_keep": pa.array(keep, type=pa.bool_()),
        })

    return ds.map_batches(kernel, batch_format="pyarrow")


def source_divergence(ds, *, text_col: str = "text",
                      source_col: str = "source", k: int = 100):
    """Per-source vocabulary divergence from the corpus — the
    domain-mixing diagnostic (which source's unigram distribution sits
    farthest from the blend): for the global top-``k`` terms, L1
    distance between the source's per-mille term frequency and the
    corpus-wide per-mille frequency, kept integer-exact:

      l1_milli(s) = Σ_{t ∈ topk} |1000·n_{s,t} // tot_s − 1000·g_t // tot|

    Output per source: (source, n_tokens, l1_milli), sources with zero
    tokens dropped, sorted by source. Top-k ties break by term asc (the
    ``top_terms`` rule).

    Shape: per-batch Counter over (source, token) → ONE slim
    ``partitioned_group_sum`` exchange on the packed key (a row per
    distinct (source, token), never per occurrence); global term counts
    and per-source totals derive from that summed table with two more
    slim group-sums; the final L1 touches ≤ k·n_sources rows on the
    driver — bounded regardless of corpus size. No text ever shuffles.
    """
    import collections

    import pyarrow as pa

    from ..functions.minhash import _ASCII_WS
    from ..pipelines.relational import partitioned_group_sum, topk

    SEP = "\x1f"

    def partials(batch: pa.Table) -> pa.Table:
        cnt: collections.Counter = collections.Counter()
        for src, t in zip(batch.column(source_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            src = src or ""
            for x in _ASCII_WS.split((t or "").lower()):
                if x:
                    cnt[src + SEP + x] += 1
        return pa.table({"key": pa.array(list(cnt.keys()), type=pa.string()),
                         "n": pa.array(list(cnt.values()), type=pa.int64())})

    summed = ds.map_batches(partials, batch_format="pyarrow")
    summed = partitioned_group_sum(summed, key="key", sum_cols={"n": "n"})

    def unpack(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        parts = pc_.split_pattern(batch.column("key"), SEP, max_splits=1)
        return pa.table({"source": pc_.list_element(parts, 0),
                         "term": pc_.list_element(parts, 1),
                         "n": batch.column("n")})

    # materialize ONCE: st is the slim sufficient statistic (one row per
    # distinct (source, token) — vocab-bounded, never per-occurrence) and
    # feeds three downstream reductions; without this each would re-run
    # the tokenization pass over the full corpus
    st = summed.map_batches(unpack, batch_format="pyarrow").materialize()

    # global term counts → bounded top-k (ties by term asc)
    gterms = partitioned_group_sum(
        st.select_columns(["term", "n"]), key="term", sum_cols={"n": "n"})
    head = topk(gterms, by=["n", "term"], descending=[True, False],
                k=k).to_pandas()

    # per-source totals: LOW-cardinality key (n_sources) — vectorized
    # per-batch Arrow partial sums, collapsed before the sort groupby so
    # no range comes out empty (the shared schemaless-block rule)
    from ray.data.aggregate import Sum

    from ..pipelines.relational import collapse_partials

    def tot_partials(b: pa.Table) -> pa.Table:
        g = b.group_by("source").aggregate([("n", "sum")])
        return pa.table({"source": g.column("source"),
                         "n": g.column("n_sum").cast(pa.int64())})

    tp = collapse_partials(
        st.select_columns(["source", "n"]).map_batches(
            tot_partials, batch_format="pyarrow"), 64)
    totals = tp.groupby("source").aggregate(
        Sum("n", alias_name="n")).to_pandas()

    top_set = set(head["term"]) if len(head) else set()
    gcount = dict(zip(head["term"], head["n"])) if len(head) else {}
    tot_all = int(totals["n"].sum()) if len(totals) else 0

    # ≤ k·n_sources rows survive this filter — driver-safe at any scale
    topk_arr = pa.array(sorted(top_set), type=pa.string())

    def keep_topk(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return b.filter(pc_.is_in(b.column("term"), value_set=topk_arr))

    sub = st.map_batches(keep_topk, batch_format="pyarrow").to_pandas()
    per_src: dict[str, dict[str, int]] = {}
    for src, term, n in zip(sub["source"], sub["term"], sub["n"]):
        per_src.setdefault(src, {})[term] = int(n)

    rows = []
    for _, r in totals.sort_values("source").iterrows():
        src, tot_s = r["source"], int(r["n"])
        if tot_s <= 0:
            continue
        cnts = per_src.get(src, {})
        l1 = sum(abs(1000 * cnts.get(t, 0) // tot_s
                     - 1000 * int(gcount[t]) // tot_all)
                 for t in top_set)
        rows.append((src, tot_s, l1))
    return pa.table({
        "source": pa.array([r[0] for r in rows], type=pa.string()),
        "n_tokens": pa.array([r[1] for r in rows], type=pa.int64()),
        "l1_milli": pa.array([r[2] for r in rows], type=pa.int64()),
    })


def bigram_commonness(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      broadcast_limit: int = 500_000, id_type=None):
    """Corpus-level bigram "language model" commonness score — the
    CCNet-style idea (score each doc against corpus statistics) kept
    integer-exact: every doc's bigram occurrences are looked up in the
    GLOBAL corpus bigram-count table (self-inclusive) and averaged.

    Output per doc: (id_col, n_bigrams, sum_count, mean_count_milli)
    with mean_count_milli = 1000·Σcount // n_bigrams (0 when no bigrams).
    Rare/garbled text scores low; formulaic text scores high.

    Shape: phase A builds global counts via per-batch Counter combiner →
    coarse-partition group-sum (the exchange carries one row per distinct
    bigram per batch, never occurrences). Phase B below the gate ships
    the slim count table ONCE via ray.put and scores each batch against
    it; above the gate it explodes slim (id, bigram) occurrence rows,
    bucket-hash-joins them against the count table, group-sums per doc,
    and unions typed zero rows so bigram-less docs stay in the output —
    each leg is a house helper (hash_join / partitioned_group_sum), so
    the all-to-all moves only slim string pairs, not documents.
    """
    import collections

    import pyarrow as pa

    from ..functions.minhash import _ASCII_WS
    from ..pipelines.relational import hash_join, partitioned_group_sum

    id_type = _resolve_id_type(ds, id_col, id_type)

    def _bigrams(t: str) -> list[str]:
        toks = [x for x in _ASCII_WS.split((t or "").lower()) if x]
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def count_partials(batch: pa.Table) -> pa.Table:
        cnt: collections.Counter = collections.Counter()
        for t in batch.column(text_col).to_pylist():
            cnt.update(_bigrams(t))
        return pa.table({"g": pa.array(list(cnt.keys()), type=pa.string()),
                         "c": pa.array(list(cnt.values()), type=pa.int64())})

    counts = partitioned_group_sum(
        ds.map_batches(count_partials, batch_format="pyarrow"),
        key="g", sum_cols={"c": "c"}).materialize()

    if counts.count() <= broadcast_limit:
        import ray as _ray

        lookup: dict[str, int] = {}
        for part in counts.iter_batches(batch_format="pyarrow"):
            lookup.update(zip(part.column("g").to_pylist(),
                              part.column("c").to_pylist()))
        lookup_ref = _ray.put(lookup)

        def score(batch: pa.Table) -> pa.Table:
            gc: dict[str, int] = _ray.get(lookup_ref)
            ids, n_bgs, sums, millis = [], [], [], []
            for i, t in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
                bgs = _bigrams(t)
                s = sum(gc.get(g, 0) for g in bgs)
                ids.append(i)
                n_bgs.append(len(bgs))
                sums.append(s)
                millis.append(1000 * s // len(bgs) if bgs else 0)
            return pa.table({
                id_col: pa.array(ids, type=id_type),
                "n_bigrams": pa.array(n_bgs, type=pa.int64()),
                "sum_count": pa.array(sums, type=pa.int64()),
                "mean_count_milli": pa.array(millis, type=pa.int64()),
            })

        return ds.map_batches(score, batch_format="pyarrow")

    # Above the gate: distributed join path. Explode slim occurrences,
    # join counts, per-doc sum, union typed zeros for bigram-less docs.
    def explode(batch: pa.Table) -> pa.Table:
        ids, gs = [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            bgs = _bigrams(t)
            ids.extend([i] * len(bgs))
            gs.extend(bgs)
        return pa.table({id_col: pa.array(ids, type=id_type),
                         "g": pa.array(gs, type=pa.string())})

    from ..pipelines.relational import choose_partitions

    n_cnt = counts.count()   # free: counts is materialized above
    occ = ds.map_batches(explode, batch_format="pyarrow")
    joined = hash_join(occ, counts, key="g",
                       num_buckets=choose_partitions(4 * n_cnt, default=32,
                                                     lo=1),
                       left_types={id_col: id_type, "g": pa.string()},
                       right_types={"g": pa.string(), "c": pa.int64()})
    def to_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({id_col: b.column(id_col),
                         "n_bigrams": pa.array([0] * len(b), type=pa.int64()),
                         "sum_count": pc.cast(b.column("c"), pa.int64())})

    # occurrence rows are data-proportional: do NOT materialize them just
    # to size the group-sum (an extra object-store pass of the whole occ
    # set); size from the known distinct-bigram count instead — per-doc
    # partials are bounded by occurrences but scale with it
    scored = partitioned_group_sum(
        joined.map_batches(to_partial, batch_format="pyarrow"),
        key=id_col, sum_cols={"n_bigrams": "n_bigrams",
                              "sum_count": "sum_count"},
        num_parts=choose_partitions(8 * n_cnt, default=64, lo=1))

    def zeros(batch: pa.Table) -> pa.Table:
        # derive from _bigrams so the count can never drift from the
        # broadcast path's definition
        n_bgs = [len(_bigrams(t))
                 for t in batch.column(text_col).to_pylist()]
        return pa.table({id_col: batch.column(id_col).cast(id_type),
                         "n_bigrams": pa.array(n_bgs, type=pa.int64()),
                         "sum_count": pa.array([0] * len(n_bgs), type=pa.int64())})

    base = ds.map_batches(zeros, batch_format="pyarrow")
    # group-sum combine emits PANDAS blocks; align to Arrow before the
    # union so the stream doesn't mix block types (schema-drift warning)
    scored = scored.map_batches(lambda b: b, batch_format="pyarrow")
    merged = partitioned_group_sum(
        base.union(scored), key=id_col,
        sum_cols={"n_bigrams": "n_bigrams", "sum_count": "sum_count"})

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.column("n_bigrams").to_numpy(zero_copy_only=False)
        s = batch.column("sum_count").to_numpy(zero_copy_only=False)
        milli = np.where(n > 0, 1000 * s // np.maximum(n, 1), 0)
        return batch.append_column(
            "mean_count_milli", pa.array(milli, type=pa.int64()))

    return merged.map_batches(finish, batch_format="pyarrow")


def chunk_documents(ds, *, chunk_tokens: int = 64, text_col: str = "text",
                    id_col: str = "doc_id", id_type=None):
    """Split every document into fixed-size token windows — the chunking
    step that turns a corpus into context-window-sized model inputs (the
    row-EXPLODE shape: output rows ≫ input rows, each batch maps to a
    fully independent exploded table, so the op stays embarrassingly
    parallel with no shuffle; Ray's streaming executor re-splits oversized
    output blocks on its own).

    Tokens are ASCII-whitespace splits of the raw text (case preserved);
    chunk text is the tokens re-joined with single spaces (original
    whitespace is NOT preserved — documented contract, exactly
    SQL-replayable). Zero-token docs emit no rows.

    Output: (id_col, chunk_idx, n_chunk_tokens, chunk_text).
    """
    import pyarrow as pa

    from ..functions.minhash import _ASCII_WS

    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")

    id_type = _resolve_id_type(ds, id_col, id_type)

    def kernel(batch: pa.Table) -> pa.Table:
        ids, idxs, ns, texts = [], [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = [x for x in _ASCII_WS.split(t or "") if x]
            for j in range(0, len(toks), chunk_tokens):
                window = toks[j:j + chunk_tokens]
                ids.append(i)
                idxs.append(j // chunk_tokens)
                ns.append(len(window))
                texts.append(" ".join(window))
        return pa.table({id_col: pa.array(ids, type=id_type),
                         "chunk_idx": pa.array(idxs, type=pa.int64()),
                         "n_chunk_tokens": pa.array(ns, type=pa.int64()),
                         "chunk_text": pa.array(texts, type=pa.string())})

    return ds.map_batches(kernel, batch_format="pyarrow")


def top_terms(ds, *, k: int = 50, text_col: str = "text"):
    """Corpus-wide term-frequency top-k (vocabulary analysis): the k most
    frequent lowercased whitespace tokens, ties broken by token ascending.

    Shape: per-batch Counter combiner (one (token, count) row per distinct
    token per batch — the exchange never carries token occurrences), then
    the shared coarse-partition group-sum and the bounded two-level topk
    (pipelines/relational.py) — no full sort at any size."""
    import collections

    import pyarrow as pa

    from ..functions.minhash import _ASCII_WS
    from ..pipelines.relational import partitioned_group_sum, topk

    def partials(batch: pa.Table) -> pa.Table:
        cnt: collections.Counter = collections.Counter()
        for t in batch.column(text_col).to_pylist():
            cnt.update(x for x in _ASCII_WS.split((t or "").lower()) if x)
        return pa.table({"term": pa.array(list(cnt.keys()), type=pa.string()),
                         "n": pa.array(list(cnt.values()), type=pa.int64())})

    counts = ds.map_batches(partials, batch_format="pyarrow")
    summed = partitioned_group_sum(counts, key="term", sum_cols={"n": "n"})
    return topk(summed, by=["n", "term"], descending=[True, False], k=k)


def source_keywords(ds, *, group_col: str = "source", text_col: str = "text",
                    k: int = 5, min_count: int = 5,
                    scale: int = 1_000_000_000,
                    broadcast_limit: int = 2_000_000):
    """Per-source DISTINCTIVE terms — the corpus-comparison report behind
    mixture decisions ("what is source X actually made of"): for every
    (source, term) with ≥ ``min_count`` occurrences, the exact-integer
    LIFT of the term's within-source rate over its corpus rate,

        lift_e9 = (n_st · N · scale) // (S_s · C_t)

    computed entirely in arbitrary-precision integers (no ln(), no float
    — the ordering is exact and the DuckDB oracle replays it in HUGEINT),
    then the top ``k`` terms per source by (lift desc, term asc).

    Shape: one (source␟term, n) Counter-partial group-sum (the top_terms
    exchange, slim); per-source totals driver-merged (sources are FEW —
    the mixture-key cardinality); per-term corpus totals via a second
    slim group-sum, joined back by broadcast under ``broadcast_limit``
    vocabulary rows and by the house term-hash join above it; per-source
    top-k through top_n_per_group (≤ k rows per source per block cross
    the exchange). Returns (source, term, n, lift_e9, rnk)."""
    import collections

    import numpy as np
    import pyarrow as pa

    import ray as _ray

    from ..functions.minhash import _ASCII_WS
    from ..pipelines.relational import (hash_join, partitioned_group_sum,
                                        top_n_per_group)

    def partials(batch: pa.Table) -> pa.Table:
        cnt: collections.Counter = collections.Counter()
        for s, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            s = s or ""
            for x in _ASCII_WS.split((t or "").lower()):
                if x:
                    cnt[(s, x)] += 1
        keys = list(cnt.keys())
        return pa.table({
            "gt_key": pa.array([f"{s}\x1f{t}" for s, t in keys],
                               type=pa.string()),
            "n": pa.array([cnt[k_] for k_ in keys], type=pa.int64())})

    summed = partitioned_group_sum(
        ds.select_columns([group_col, text_col]).map_batches(
            partials, batch_format="pyarrow"),
        key="gt_key", sum_cols={"n": "n"})

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "term": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        parts = df["gt_key"].str.split("\x1f", n=1, expand=True)
        return pd.DataFrame({"source": parts[0], "term": parts[1],
                             "n": df["n"].astype("int64")})

    st = summed.map_batches(split, batch_format="pandas").materialize()

    # per-source totals: the mixture keys are FEW (and per-batch partials
    # are one row per source per block), so the driver merge is bounded
    sp = st.map_batches(
        lambda df: df.groupby("source", as_index=False)["n"].sum(),
        batch_format="pandas").to_pandas()
    s_tot = {s: int(v) for s, v in
             sp.groupby("source")["n"].sum().items()}
    n_tot = sum(s_tot.values())

    c_tot = partitioned_group_sum(
        st.map_batches(lambda b: b.select(["term", "n"]),
                       batch_format="pyarrow"),
        key="term", sum_cols={"c_n": "n"}).materialize()

    out_cols = ["source", "term", "n", "lift_e9"]

    def score(df: pd.DataFrame, lookup=None) -> pd.DataFrame:
        df = df[df["n"] >= min_count]
        if not len(df):
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "term": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64"),
                                 "lift_e9": pd.Series(dtype="int64")})
        cn = (df["term"].map(lookup) if lookup is not None
              else df["c_n"]).astype("int64")
        # Python-int lift: the operands overflow int64 by design (n·N·1e9)
        # and the oracle's HUGEINT division must be matched exactly; rows
        # here are the ≥min_count vocabulary slice, not the corpus
        lifts = [(int(n) * n_tot * scale) // (s_tot[s] * int(c))
                 for s, n, c in zip(df["source"], df["n"], cn)]
        out = pd.DataFrame({"source": df["source"].to_numpy(),
                            "term": df["term"].to_numpy(),
                            "n": df["n"].to_numpy(),
                            "lift_e9": np.array(lifts, dtype=np.int64)})
        return out

    if c_tot.count() <= broadcast_limit:
        cdf = c_tot.to_pandas()
        c_ref = _ray.put(dict(zip(cdf["term"], cdf["c_n"])))

        def score_broadcast(df: pd.DataFrame) -> pd.DataFrame:
            return score(df, lookup=_ray.get(c_ref))

        scored = st.map_batches(score_broadcast, batch_format="pandas")
    else:
        j = hash_join(st, c_tot, key="term", num_buckets=32,
                      left_types={"source": pa.string(),
                                  "term": pa.string(), "n": pa.int64()},
                      right_types={"term": pa.string(), "c_n": pa.int64()})
        scored = j.map_batches(score, batch_format="pandas")

    ranked = top_n_per_group(scored, group_col="source",
                             order_cols=["lift_e9", "term"],
                             descending=[True, False], n=k)
    return ranked.map_batches(
        lambda df: df.reindex(columns=out_cols + ["rnk"]),
        batch_format="pandas")


def bpe_token_counts(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     num_merges: int = 64, vocab_words: int = 2000):
    """Per-document subword token count under a BPE vocabulary TRAINED ON
    THIS CORPUS — the end-to-end tokenization pipeline:

    1. one distributed word-count exchange (the ``top_terms`` shape:
       per-batch Counter partials, coarse group-sum, bounded top-k) keeps
       the ``vocab_words`` most frequent words — the standard practice at
       scale, since the word-frequency table is BPE's sufficient
       statistic and its head carries nearly all merge mass;
    2. ``functions/bpe.train_bpe`` runs ON THE DRIVER over that bounded
       table (deterministic tie-breaks — reproducible vocab);
    3. the merge ranks broadcast by closure and a second embarrassingly
       parallel pass encodes every document (out-of-vocab words still
       encode — BPE degrades to characters, never fails).

    Returns (id, n_words, n_bpe_tokens).  Non-SQL-expressible (iterative
    training), so the driver gate is rows-only; the kernels are
    pytest-gated against the classic hand-worked example instead.
    """
    import pyarrow as pa

    from ..functions.bpe import apply_bpe, train_bpe
    from ..functions.minhash import _ASCII_WS

    # the word-frequency head IS top_terms — one shared tokenizer/count
    # pipeline, so the BPE vocab can't drift from the corpus term stats
    head = top_terms(ds, k=vocab_words, text_col=text_col).to_pandas()
    freqs = dict(zip(head["term"], head["n"])) if "term" in head.columns else {}
    merges = train_bpe(freqs, num_merges)
    ranks = {p: i for i, p in enumerate(merges)}

    def encode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        n_words, n_tokens = [], []
        cache: dict[str, int] = {}
        for t in batch.column(text_col).to_pylist():
            words = [x for x in _ASCII_WS.split((t or "").lower()) if x]
            total = 0
            for w in words:
                hit = cache.get(w)
                if hit is None:
                    hit = cache[w] = len(apply_bpe(w, ranks))
                total += hit
            n_words.append(len(words))
            n_tokens.append(total)
        return pa.table({id_col: ids,
                         "n_words": pa.array(n_words, type=pa.int64()),
                         "n_bpe_tokens": pa.array(n_tokens, type=pa.int64())})

    return ds.map_batches(encode, batch_format="pyarrow")


def lm_perplexity(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  lang_col: str = "lang", ref_lang: str = "en"):
    """CCNet-style language-model quality scoring: a smoothed character
    TRIGRAM LM is trained on the corpus's reference slice
    (``lang == ref_lang``) and every document is scored by its total
    negative log-likelihood — the classic perplexity filter signal
    (lower = more like the reference distribution).

    Scale shape: pass 1 is one bounded trigram-count exchange (distinct
    char trigrams ≤ charset³ — the count table, not the corpus, is the
    LM's sufficient statistic); the driver turns counts into PER-TRIGRAM
    INTEGER milli NLL values (``round(-1000·ln((c+1)/(N+V+1)))``, OOV
    bucket ``c=0``) rounded half-away BEFORE summation, so every
    document score is an order-free exact int64 sum — DuckDB-replayable
    bit for bit.  Pass 2 is embarrassingly parallel with the milli table
    broadcast.  Returns (id, n_trigrams, nll_milli) for documents with
    ≥1 trigram.
    """
    import collections
    import math

    import pyarrow as pa
    import pyarrow.compute as pc

    from ..pipelines.relational import partitioned_group_sum

    def tri_partials(batch: pa.Table) -> pa.Table:
        cnt: collections.Counter = collections.Counter()
        langs = batch.column(lang_col).to_pylist()
        for t, lg in zip(batch.column(text_col).to_pylist(), langs):
            if lg != ref_lang or not t:
                continue
            t = t.lower()
            cnt.update(t[i:i + 3] for i in range(len(t) - 2))
        return pa.table({"g": pa.array(list(cnt.keys()), type=pa.string()),
                         "c": pa.array(list(cnt.values()), type=pa.int64())})

    counts = partitioned_group_sum(
        ds.map_batches(tri_partials, batch_format="pyarrow"),
        key="g", sum_cols={"c": "c"}).to_pandas()
    if len(counts) == 0 or "g" not in counts.columns:
        grams, n_total, v = {}, 0, 0
    else:
        grams = dict(zip(counts["g"], counts["c"].astype(int)))
        n_total = int(counts["c"].sum())
        v = len(grams)
    denom = float(n_total + v + 1)

    def milli(c: int) -> float:
        return -1000.0 * math.log((c + 1) / denom)

    vals = pa.array([milli(c) for c in grams.values()], type=pa.float64())
    milli_int = pc.cast(pc.round(vals, round_mode="half_towards_infinity"),
                        pa.int64()).to_pylist()
    lp = dict(zip(grams.keys(), milli_int))
    oov = int(pc.cast(pc.round(pa.array([milli(0)]),
                               round_mode="half_towards_infinity"),
                      pa.int64())[0].as_py())

    import ray as _ray

    lp_ref = _ray.put(lp)

    def score(batch: pa.Table) -> pa.Table:
        table = _ray.get(lp_ref)
        ids_in = batch.column(id_col).to_pylist()
        ids, n_tris, nlls = [], [], []
        for i, t in zip(ids_in, batch.column(text_col).to_pylist()):
            raw = t or ""
            t = raw.lower()
            # SQL parity, exactly: the oracle filters on the RAW length
            # (WHERE length(text) >= 3) and its GROUP BY drops docs whose
            # LOWERED text yields no positions — str.lower() can change
            # length ('İ' lowers to 2 chars in python), so both checks
            # are needed. Known residual divergence: DuckDB's lower()
            # differs from python's on a few locale-special codepoints
            # (e.g. İ) — such chars alter trigram CONTENT either way.
            if len(raw) < 3 or len(t) < 3:
                continue
            total = 0
            get = table.get
            for j in range(len(t) - 2):
                total += get(t[j:j + 3], oov)
            ids.append(i)
            n_tris.append(len(t) - 2)
            nlls.append(total)
        id_type = batch.schema.field(id_col).type
        return pa.table({id_col: pa.array(ids, type=id_type),
                         "n_trigrams": pa.array(n_tris, type=pa.int64()),
                         "nll_milli": pa.array(nlls, type=pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def lm_perplexity_backoff(ds, *, text_col: str = "text",
                          id_col: str = "doc_id", lang_col: str = "lang",
                          ref_lang: str = "en", alpha: float = 0.4):
    """Stupid-backoff character LM scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation" — the web-scale backoff rule:
    no discounting, a fixed backoff factor, counts only):

        S(c₃|c₁c₂) = n₃/n₂(c₁c₂)            if the trigram was seen
                   = α · n₂(c₂c₃)/n₁(c₂)    elif that bigram was seen
                   = α² · n₁(c₃)/N          elif the char was seen
                   = α² · 1/(N+1)           else (OOV floor)

    Same scale shape as :func:`lm_perplexity`: ONE bounded count exchange
    (uni+bi+tri gram counts of the reference slice ride one group-sum —
    string length separates the orders, so no key collisions), the driver
    folds counts into per-ngram INTEGER milli NLL tables (half-away
    rounding BEFORE summation → order-free exact int64 document scores,
    DuckDB-replayable bit for bit), then an embarrassingly parallel
    broadcast scoring pass. Returns (id, n_trigrams, nll_milli) for
    documents with ≥ 1 trigram.
    """
    import collections
    import math

    import pyarrow as pa
    import pyarrow.compute as pc

    from ..pipelines.relational import partitioned_group_sum

    def gram_partials(batch: pa.Table) -> pa.Table:
        cnt: collections.Counter = collections.Counter()
        langs = batch.column(lang_col).to_pylist()
        for t, lg in zip(batch.column(text_col).to_pylist(), langs):
            if lg != ref_lang or not t:
                continue
            t = t.lower()
            cnt.update(t)                                       # unigrams
            cnt.update(t[i:i + 2] for i in range(len(t) - 1))   # bigrams
            cnt.update(t[i:i + 3] for i in range(len(t) - 2))   # trigrams
        return pa.table({"g": pa.array(list(cnt.keys()), type=pa.string()),
                         "c": pa.array(list(cnt.values()), type=pa.int64())})

    counts = partitioned_group_sum(
        ds.map_batches(gram_partials, batch_format="pyarrow"),
        key="g", sum_cols={"c": "c"}).to_pandas()
    c1: dict = {}
    c2: dict = {}
    c3: dict = {}
    if len(counts) and "g" in counts.columns:
        for g, c in zip(counts["g"], counts["c"].astype(int)):
            (c1 if len(g) == 1 else c2 if len(g) == 2 else c3)[g] = c
    n_total = sum(c1.values())

    def _milli_int(raw: list[float]) -> list[int]:
        return pc.cast(pc.round(pa.array(raw, type=pa.float64()),
                                round_mode="half_towards_infinity"),
                       pa.int64()).to_pylist()

    # float expression ORDER matters for bit parity with the SQL replay:
    # each is written exactly as the oracle's ln() argument
    a2 = alpha * alpha
    m3 = dict(zip(c3.keys(), _milli_int(
        [-1000.0 * math.log(c / c2[g[:2]]) for g, c in c3.items()])))
    m2 = dict(zip(c2.keys(), _milli_int(
        [-1000.0 * math.log(alpha * c / c1[g[0]]) for g, c in c2.items()])))
    m1 = dict(zip(c1.keys(), _milli_int(
        [-1000.0 * math.log(a2 * c / n_total) for c in c1.values()])))
    oov = _milli_int([-1000.0 * math.log(a2 / (n_total + 1))])[0]

    import ray as _ray

    tables_ref = _ray.put((m3, m2, m1))

    def score(batch: pa.Table) -> pa.Table:
        t3, t2, t1 = _ray.get(tables_ref)
        ids_in = batch.column(id_col).to_pylist()
        ids, n_tris, nlls = [], [], []
        for i, t in zip(ids_in, batch.column(text_col).to_pylist()):
            raw = t or ""
            t = raw.lower()
            # same raw-length + lowered-length parity rule (and the same
            # documented lower() caveat) as lm_perplexity above
            if len(raw) < 3 or len(t) < 3:
                continue
            total = 0
            for j in range(len(t) - 2):
                tri = t[j:j + 3]
                m = t3.get(tri)
                if m is None:
                    m = t2.get(tri[1:])
                    if m is None:
                        m = t1.get(tri[2], oov)
                total += m
            ids.append(i)
            n_tris.append(len(t) - 2)
            nlls.append(total)
        id_type = batch.schema.field(id_col).type
        return pa.table({id_col: pa.array(ids, type=id_type),
                         "n_trigrams": pa.array(n_tris, type=pa.int64()),
                         "nll_milli": pa.array(nlls, type=pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al. 2023, public): score raw
# documents by the log-likelihood ratio of hashed n-gram features under a
# target-distribution bag-of-ngrams model vs the raw distribution, then
# keep/resample by weight.
# ---------------------------------------------------------------------------

def _dsir_grams(text: str) -> list[str]:
    """Unigrams + bigrams over the house tokenizer (lowercase,
    ``_ASCII_WS`` split — identical to bigram_commonness), the paper's
    hashed n-gram feature set. SQL replay: ``list_filter(
    string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'), x -> x <> '')``
    unioned with the 1-based bigram list comprehension idiom."""
    from ..functions.minhash import _ASCII_WS

    toks = [x for x in _ASCII_WS.split((text or "").lower()) if x]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _dsir_bucket(gram: str, n_buckets: int) -> int:
    """md5-uint64 feature hash bucket. SQL replay: ``CAST(concat('0x',
    substr(md5(g), 1, 16)) AS UBIGINT) % n_buckets``."""
    import hashlib

    return int(hashlib.md5(gram.encode()).hexdigest()[:16], 16) % n_buckets


def dsir_train(target_texts, raw_texts, *, n_buckets: int = 64) -> np.ndarray:
    """Driver-side DSIR table: per-bucket integer-milli log-likelihood
    ratio ``lam_milli[b] = round_half_away(1000 * (ln p_target[b] -
    ln p_raw[b]))`` with add-1 smoothing over hashed (uni+bi)-gram bucket
    counts from two BOUNDED samples. Deterministic — no RNG; the floats
    never leave the driver (scoring sums the int64 table), so the SQL
    oracle inlines the identical literals and the per-doc sum is
    order-free exact."""
    import numpy as np

    def counts(texts) -> np.ndarray:
        import collections

        c = np.zeros(n_buckets, dtype=np.int64)
        cnt: collections.Counter = collections.Counter()
        for t in texts:
            cnt.update(_dsir_grams(t))
        for g, k in cnt.items():  # hash each distinct gram once
            c[_dsir_bucket(g, n_buckets)] += k
        return c

    ct, cr = counts(target_texts), counts(raw_texts)
    lam = (np.log((ct + 1.0) / float(ct.sum() + n_buckets))
           - np.log((cr + 1.0) / float(cr.sum() + n_buckets)))
    return np.sign(lam).astype(np.int64) * np.floor(
        np.abs(lam) * 1000.0 + 0.5).astype(np.int64)


def dsir_weights(ds, lam_milli: np.ndarray, *, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Score every document with a trained DSIR table (ONE stateless
    vectorized pass, no shuffle — the table is ``n_buckets`` int64s in
    the task closure, never re-shipped per batch). Output per doc:

      n_grams      = unigram + bigram occurrences
      weight_milli = Σ lam_milli[bucket(gram)]  (int64, order-free)
      dsir_keep    = weight_milli >= 0  (the resampling threshold at
                     importance ratio 1; callers resample by weight for
                     the paper's full recipe)
    """
    import numpy as np
    import pyarrow as pa

    lam = np.asarray(lam_milli, dtype=np.int64)
    n_buckets = len(lam)

    def score(batch: pa.Table) -> pa.Table:
        bucket_cache: dict[str, int] = {}  # grams are Zipfian: hash once

        def _b(g: str) -> int:
            b = bucket_cache.get(g)
            if b is None:
                b = bucket_cache[g] = _dsir_bucket(g, n_buckets)
            return b

        ids, n_grams, weights = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            grams = _dsir_grams(t)
            ids.append(i)
            n_grams.append(len(grams))
            weights.append(int(sum(int(lam[_b(g)]) for g in grams)))
        return pa.table({
            id_col: pa.array(ids, type=batch.schema.field(id_col).type),
            "n_grams": pa.array(n_grams, type=pa.int64()),
            "weight_milli": pa.array(weights, type=pa.int64()),
            "dsir_keep": pa.array([w >= 0 for w in weights], type=pa.bool_()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def badwords_filter(ds, terms: list[str], *, text_col: str = "text",
                    id_col: str = "doc_id"):
    """C4-style banned-word filter (Raffel et al. 2020, public: drop any
    page containing a blocklisted word). Output per doc:

      n_banned    = total non-overlapping word-boundary occurrences of
                    any term over ``' ' || lower(text) || ' '`` (the
                    replace-length trick — SQL-exact, same contract as
                    the lang-id stopword votes)
      banned_keep = n_banned == 0

    One stateless vectorized pass; the term list rides in the task
    closure. Word boundary = space delimiters, so back-to-back
    occurrences ("bad bad") count once per consumed delimiter — the
    documented stopword-vote contract, reproduced verbatim in SQL.
    Case folding is python ``str.lower`` vs SQL ``lower()`` — identical
    on ASCII; the locale-codepoint caveat is documented at the LM
    scorers (the synth corpus is clean).
    """
    from ..functions.textstats import substring_occurrences

    import numpy as np

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        padded = " " + batch[text_col].fillna("").str.lower() + " "
        total = np.zeros(len(batch), dtype="int64")
        for w in terms:
            total = total + substring_occurrences(padded, f" {w} ").to_numpy()
        return pd.DataFrame({id_col: batch[id_col],
                             "n_banned": total,
                             "banned_keep": total == 0})

    return ds.map_batches(kernel, batch_format="pandas")


#: PII patterns, deliberately restricted to syntax with IDENTICAL
#: semantics in python re and DuckDB's RE2: explicit [0-9] classes (py
#: \d is Unicode), no \b (py is Unicode-aware, RE2 is ASCII), no
#: lookaround (RE2 has none). Replacement ORDER is part of the contract:
#: email → ipv4 → phone, each pass counting/replacing on the previous
#: pass's output, so e.g. digits inside an already-redacted email can't
#: double-count as a phone.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("phone", r"\+[0-9]{7,15}", "<PHONE>"),
)


def redact_pii(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """PII masking (the standard pre-training redaction pass — e.g. the
    BigScience/ROOTS pipeline, public): sequentially count and replace
    emails, bare IPv4s and international phone numbers with sentinel
    tokens. One stateless vectorized pandas pass (str.count/str.replace
    are C-speed); no shuffle. Output: (id_col, n_email, n_ipv4, n_phone,
    text_redacted).

    SQL replay is exact by construction: each pattern is RE2∩python-re
    compatible (see PII_PATTERNS) and the oracle nests
    regexp_replace(..., 'g') in the same order, counting each pattern on
    the previous replacement's output. IPv4 matching is substring-level
    (no word boundaries — RE2 \\b is ASCII, python's is Unicode; the
    over-match is the documented approximation).
    """
    import numpy as np

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        out = {id_col: batch[id_col]}
        for name, pat, repl in PII_PATTERNS:
            out[f"n_{name}"] = t.str.count(pat).astype("int64").to_numpy()
            t = t.str.replace(pat, repl, regex=True)
        out["text_redacted"] = t.to_numpy()
        return pd.DataFrame(out)

    return ds.map_batches(kernel, batch_format="pandas")


def redact_pii_sql(table: str = "documents", *, text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    """One-statement DuckDB replay of :func:`redact_pii` (nested global
    regexp_replace, counts on each stage's input)."""
    stages, expr = [], text_col
    for name, pat, repl in PII_PATTERNS:
        lit = pat.replace("'", "''")
        stages.append((name, lit, expr))
        expr = f"regexp_replace({expr}, '{lit}', '{repl}', 'g')"
    counts = ", ".join(
        f"CAST(length(regexp_extract_all({src}, '{lit}')) AS BIGINT)"
        f" AS n_{name}" for name, lit, src in stages)
    return (f"SELECT {id_col}, {counts}, {expr} AS text_redacted "
            f"FROM {table}")


def inverted_index(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   min_df: int = 3, nrows: int | None = None):
    """Distributed inverted-index build: one output row per term with
    document frequency, total term frequency, and the full posting list
    (``doc:tf`` pairs, comma-joined, doc-id ascending) — the IR-engine
    artifact (public shape: any search-engine indexing pipeline), absent
    from the reference. ``min_df`` drops the hapax tail (the bulk of the
    vocabulary, nearly useless for retrieval).

    Scale shape: the per-batch combiner emits one (term, doc, tf) row per
    DISTINCT term per document (a document is one row, so its terms never
    span batches — per-batch distinct IS globally distinct); that slim
    triple exchange is the index itself, partitioned by term hash, and
    the per-partition kernel is one vectorized sort + groupby. Postings
    for stopword-class terms grow with the corpus — at 100 TB either
    drop them (pass a max-df filter downstream) or shard the posting
    list by doc-id range; this builder keeps the contract simple and
    SQL-replayable. Tokenization is the house lowercased ASCII-\\s+ rule
    (shared with top_terms/bm25)."""
    import collections

    import pyarrow as pa

    from ..functions.minhash import _ASCII_WS
    from ..pipelines.relational import coarse_partition_apply

    def partials(batch: pa.Table) -> pa.Table:
        terms, ids, tfs = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            cnt = collections.Counter(
                x for x in _ASCII_WS.split((t or "").lower()) if x)
            terms.extend(cnt.keys())
            ids.extend([i] * len(cnt))
            tfs.extend(cnt.values())
        # id column typed from the INPUT schema: an all-empty batch would
        # otherwise emit a null-typed column and a mixed-schema block
        return pa.table({"term": pa.array(terms, type=pa.string()),
                         id_col: pa.array(ids,
                                          type=batch.column(id_col).type),
                         "tf": pa.array(tfs, type=pa.int64())})

    triples = ds.map_batches(partials, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", id_col], kind="mergesort")
        g["entry"] = g[id_col].astype(str) + ":" + g["tf"].astype(str)
        agg = g.groupby("term", as_index=False).agg(
            df=(id_col, "size"), tf_total=("tf", "sum"),
            postings=("entry", ",".join))
        return agg.loc[agg["df"] >= min_df,
                       ["term", "df", "tf_total", "postings"]]

    return coarse_partition_apply(triples, fold, key_col="term",
                                  part_col="ii_part", num_parts=64,
                                  nrows=nrows)


def perplexity_buckets(ds, *, k: int = 3, text_col: str = "text",
                       id_col: str = "doc_id", lang_col: str = "lang",
                       ref_lang: str = "en"):
    """CCNet's head/middle/tail perplexity binning (Wenzek et al. 2020,
    public): score every document with the trigram LM
    (:func:`lm_perplexity`), then assign equal-depth NTILE(k) buckets
    over ascending average NLL — bucket 1 = head (most reference-like),
    k = tail. The standard corpus-quality partition consumed by
    curriculum samplers.

    Integer-exact end to end: the per-doc score is
    ``avg_nll_micro = (nll_milli * 1000) // n_trigrams`` (int64 floor),
    and the global tile comes from the house two-pass distributed rank
    (``ranked_by_value`` — no global sort) over the composite order key
    ``avg_nll_micro·2^33 + doc_id``, whose ordering equals SQL
    ``ORDER BY avg_nll_micro, doc_id``; the tile split is DuckDB's
    larger-buckets-first arithmetic, so the whole operator SQL-replays.
    Packing bounds are ASSERTED, not assumed: ``doc_id < 2^33`` (~8.6B
    docs) and ``avg_nll_micro < 2^30`` (~1073 nats/trigram — far above
    any real LM score), so id bits can never bleed into the score bits
    and silently mis-order ranks; past 2^33 docs switch the order key to
    the two-column (score, id) form through a string key.

    Returns (id, avg_nll_micro, bucket) for documents with ≥1 trigram.
    """
    import numpy as np
    import pyarrow as pa

    from ..pipelines.relational import ranked_by_value

    ppl = lm_perplexity(ds, text_col=text_col, id_col=id_col,
                        lang_col=lang_col, ref_lang=ref_lang).materialize()
    n = ppl.count()

    def make_ds():
        def prep(df: pd.DataFrame) -> pd.DataFrame:
            avg = ((df["nll_milli"].to_numpy(np.int64) * 1000)
                   // df["n_trigrams"].to_numpy(np.int64))
            ids = df[id_col].to_numpy(np.int64)
            # loud-failure guards for the 2^33/2^30 packing (docstring)
            assert ids.size == 0 or (0 <= ids.min()
                                     and ids.max() < (1 << 33)), \
                "perplexity_buckets: doc_id exceeds the 2^33 order-key slice"
            assert avg.size == 0 or (0 <= avg.min()
                                     and avg.max() < (1 << 30)), \
                "perplexity_buckets: avg_nll_micro exceeds 2^30"
            key = (avg << 33) + ids
            return pd.DataFrame({id_col: df[id_col],
                                 "avg_nll_micro": avg,
                                 "pb_g": np.zeros(len(df), dtype=np.int64),
                                 "pb_key": key})

        return ppl.map_batches(prep, batch_format="pandas")

    # shift=45 keeps bucket granularity at avg_nll_micro >> 12 (the same
    # coarse-offset footprint the 2^24 packing had with shift=36)
    ranked = ranked_by_value(make_ds, group_col="pb_g", value_col="pb_key",
                             out_cols=[id_col, "avg_nll_micro"], shift=45,
                             nrows=n)
    q, r = divmod(n, k)
    big = (q + 1) * r
    qq = max(q, 1)

    def to_tile(df: pd.DataFrame) -> pd.DataFrame:
        rn = df["rnk"].to_numpy(np.int64)
        tile = np.where(rn <= big, (rn - 1) // (q + 1),
                        r + (rn - 1 - big) // qq) + 1
        return pd.DataFrame({id_col: df[id_col],
                             "avg_nll_micro": df["avg_nll_micro"],
                             "bucket": tile.astype(np.int64)})

    return ranked.map_batches(to_tile, batch_format="pandas")


def datacard(ds, *, text_col: str = "text", source_col: str = "source",
             lang_col: str = "lang"):
    """Per-source dataset DATACARD — the release datasheet every public
    corpus ships (Gebru et al., "Datasheets for Datasets", 2018): docs,
    characters, whitespace tokens, distinct-text count (exact-dup
    signal) and language count per source, every number exactly
    SQL-replayable.

    Three passes, all slim:
    - sums: per-batch pandas groupby partials (source, n_docs, n_chars,
      n_tokens) through the house group-sum — one bounded exchange of
      ≤ sources×blocks rows;
    - distinct texts: per-batch-distinct (source, text-md5-u64) pairs,
      coarse-partitioned BY HASH so every copy of a pair co-locates,
      deduped and counted per source inside the partition, partial
      counts group-summed — text never moves, only u64 hashes;
    - langs: same shape over (source, lang), alphabet-bounded.
    The three ≤|sources|-row results merge driver-side. A 64-bit text
    hash collision undercounts distinct texts by one — the standard
    hash-identity trade, same as exact dedup."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import md5_u64
    from ..pipelines.relational import (coarse_partition_apply,
                                        partitioned_group_sum)

    def sum_partials(g: pd.DataFrame) -> pd.DataFrame:
        src = g[source_col].fillna("")
        toks = textstats.token_count(g[text_col])
        chars = g[text_col].fillna("").str.len().astype("int64")
        out = pd.DataFrame({"source": src, "docs": 1,
                            "chars": chars, "toks": toks})
        return out.groupby("source", as_index=False).sum()

    sums = partitioned_group_sum(
        ds.map_batches(sum_partials, batch_format="pandas"),
        key="source",
        sum_cols={"n_docs": "docs", "n_chars": "chars",
                  "n_tokens": "toks"})

    def th_pairs(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        srcs = [s or "" for s in batch.column(source_col).to_pylist()]
        df = pd.DataFrame({"source": srcs,
                           "th": md5_u64(texts)}).drop_duplicates()
        return pa.table({
            "source": pa.array(df["source"].tolist(), type=pa.string()),
            "th": pa.array(df["th"].to_numpy(dtype=np.uint64),
                           type=pa.uint64())})

    def count_distinct_th(part: pd.DataFrame) -> pd.DataFrame:
        d = part.drop_duplicates(["source", "th"])
        out = d.groupby("source", as_index=False).size()
        return pd.DataFrame({"source": out["source"],
                             "n": out["size"].astype("int64")})

    th = ds.map_batches(th_pairs, batch_format="pyarrow").materialize()
    th_counts = partitioned_group_sum(
        coarse_partition_apply(th, count_distinct_th, key_col="th",
                               part_col="dc_part", num_parts=64,
                               nrows=th.count()),
        key="source", sum_cols={"n_distinct_texts": "n"})

    def lang_pairs(batch: pa.Table) -> pa.Table:
        srcs = [s or "" for s in batch.column(source_col).to_pylist()]
        langs = batch.column(lang_col).to_pylist()
        df = pd.DataFrame({"source": srcs, "lang": langs})
        df = df[df["lang"].notna()].drop_duplicates()
        return pa.table({
            "source": pa.array(df["source"].tolist(), type=pa.string()),
            "lang": pa.array(df["lang"].tolist(), type=pa.string())})

    def count_distinct_lang(part: pd.DataFrame) -> pd.DataFrame:
        d = part.drop_duplicates(["source", "lang"])
        out = d.groupby("source", as_index=False).size()
        return pd.DataFrame({"source": out["source"],
                             "n": out["size"].astype("int64")})

    lp = ds.map_batches(lang_pairs, batch_format="pyarrow").materialize()
    lang_counts = partitioned_group_sum(
        coarse_partition_apply(lp, count_distinct_lang, key_col="lang",
                               part_col="dl_part", num_parts=8,
                               nrows=lp.count()),
        key="source", sum_cols={"n_langs": "n"})

    # ≤ |sources| rows each — merge driver-side
    a = sums.to_pandas()
    b = th_counts.to_pandas()
    c = lang_counts.to_pandas()
    out = a.merge(b, on="source", how="left").merge(c, on="source",
                                                    how="left")
    for col in ("n_distinct_texts", "n_langs"):
        out[col] = out[col].fillna(0).astype("int64")
    for col in ("n_docs", "n_chars", "n_tokens"):
        out[col] = out[col].astype("int64")
    return out[["source", "n_docs", "n_chars", "n_tokens",
                "n_distinct_texts", "n_langs"]]


def length_outliers(ds, *, len_col: str = "n_chars",
                    source_col: str = "source", id_col: str = "doc_id",
                    k: int = 3):
    """Per-source ROBUST length-outlier flags — median/MAD instead of
    mean/stddev (Leys et al. 2013, the standard robust rule), the
    pre-training filter that catches boilerplate stubs and concatenation
    blowups without being dragged by the outliers themselves. A doc is
    flagged when |len - median_src| > k * MAD_src, every quantity an
    exact integer so the DuckDB oracle (quantile_disc) matches bit-wise.

    Distributed shape — the token_percentiles histogram trick, per
    group: lengths are integers, so an exact per-source median reduces
    to (source, len, n) count partials through the house group-sum (the
    exchange is bounded by sources × distinct lengths, independent of
    corpus size); the driver walks each source's cumulative counts at
    quantile index ceil(n/2)-1 (the quantile_disc convention), a second
    identical pass folds |len - med| deviation counts for the MAD, and
    the ≤|sources| (median, mad) pairs broadcast into one vectorized
    flag pass. Text never moves; no full sort anywhere."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray as _ray

    from ..pipelines.relational import partitioned_group_sum

    def len_counts(g: pd.DataFrame) -> pd.DataFrame:
        src = g[source_col].fillna("")
        out = pd.DataFrame({"source": src,
                            "v": g[len_col].astype("int64"), "n": 1})
        return out.groupby(["source", "v"], as_index=False).sum()

    def fold_counts(counts_df: pd.DataFrame) -> dict:
        """source → discrete median via cumulative counts."""
        med = {}
        for src, sub in counts_df.groupby("source", sort=False):
            sub = sub.sort_values("v")
            n = int(sub["n"].sum())
            idx = max(0, math.ceil(0.5 * n) - 1)
            cum = sub["n"].cumsum().to_numpy()
            med[src] = int(sub["v"].to_numpy()[
                np.searchsorted(cum, idx + 1)])
        return med

    def key_counts(stage_fn):
        partials = ds.map_batches(stage_fn,
                                  batch_format="pandas").materialize()
        summed = partitioned_group_sum(
            partials, key="source_v", sum_cols={"n": "n"},
            nrows=partials.count())
        df = summed.to_pandas()
        parts = df["source_v"].str.rsplit("\x1f", n=1, expand=True)
        return pd.DataFrame({"source": parts[0],
                             "v": parts[1].astype("int64"),
                             "n": df["n"].astype("int64")})

    def pack_key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source_v": df["source"] + "\x1f" + df["v"].astype(str),
            "n": df["n"]})

    med = fold_counts(key_counts(lambda g: pack_key(len_counts(g))))
    med_ref = _ray.put(med)

    def dev_counts(g: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(med_ref)
        src = g[source_col].fillna("")
        meds = src.map(m).astype("int64")
        dev = (g[len_col].astype("int64") - meds).abs()
        out = pd.DataFrame({"source": src, "v": dev, "n": 1})
        return out.groupby(["source", "v"], as_index=False).sum()

    mad = fold_counts(key_counts(lambda g: pack_key(dev_counts(g))))
    stats_ref = _ray.put({s: (med[s], mad[s]) for s in med})

    def flag(batch: pa.Table) -> pa.Table:
        st = _ray.get(stats_ref)
        src = [s or "" for s in batch.column(source_col).to_pylist()]
        lens = batch.column(len_col).to_numpy(zero_copy_only=False)
        meds = np.array([st[s][0] for s in src], dtype=np.int64)
        mads = np.array([st[s][1] for s in src], dtype=np.int64)
        out = np.abs(lens.astype(np.int64) - meds) > k * mads
        return pa.table({
            id_col: batch.column(id_col),
            "source": pa.array(src, type=pa.string()),
            len_col: pa.array(lens.astype(np.int64), type=pa.int64()),
            "is_outlier": pa.array(out)})

    return ds.map_batches(flag, batch_format="pyarrow")
