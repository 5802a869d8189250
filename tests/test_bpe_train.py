"""BPE training/encoding kernels + the distributed token-count pipeline."""

import pandas as pd
import pytest

from pdf_parser_ray.functions.bpe import apply_bpe, train_bpe


class TestBpeKernels:
    def test_hand_worked_example(self):
        # freqs: "abab"x2, "abc"x1 → (a,b)=5 beats all → then (ab,ab)=2
        merges = train_bpe({"abab": 2, "abc": 1}, num_merges=10)
        assert merges == [("a", "b"), ("ab", "ab")]
        ranks = {p: i for i, p in enumerate(merges)}
        assert apply_bpe("abab", ranks) == ["abab"]
        assert apply_bpe("abc", ranks) == ["ab", "c"]
        # lowest-rank merge replays first, leftmost-first within a pass
        assert apply_bpe("ababab", ranks) == ["abab", "ab"]
        # out-of-vocab degrades to characters, never fails
        assert apply_bpe("xyz", ranks) == ["x", "y", "z"]

    def test_tie_breaks_lexicographic(self):
        assert train_bpe({"ab": 2, "cd": 2}, 1) == [("a", "b")]

    def test_stops_when_no_pair_repeats(self):
        merges = train_bpe({"ab": 1, "cd": 1}, 10)
        assert merges == []  # every pair count is 1 < 2

    def test_training_segmentation_matches_encoding(self):
        # encoding a training word reproduces its final training split
        freqs = {"lower": 4, "low": 3, "newest": 5, "widest": 2}
        merges = train_bpe(freqs, 8)
        ranks = {p: i for i, p in enumerate(merges)}
        syms = {w: [c for c in w] for w in freqs}
        from pdf_parser_ray.functions.bpe import _merge_word
        for m in merges:
            syms = {w: _merge_word(s, m) for w, s in syms.items()}
        for w in freqs:
            assert apply_bpe(w, ranks) == syms[w], w


@pytest.mark.usefixtures("ray_session")
class TestBpePipeline:
    def test_counts_over_documents(self):
        import duckdb
        import ray.data

        from pdf_parser_ray.stages.textstage import bpe_token_counts

        sf = "/root/testdata/sf0.001"
        ds = ray.data.read_parquet(f"{sf}/documents.parquet",
                                   columns=["doc_id", "text"])
        out = bpe_token_counts(ds, num_merges=32, vocab_words=500).to_pandas()
        n_docs = duckdb.sql(
            f"SELECT count(*) FROM '{sf}/documents.parquet'").fetchall()[0][0]
        assert len(out) == n_docs
        # subwords are at least one per word and at most characters
        assert (out["n_bpe_tokens"] >= out["n_words"]).all()
        # deterministic: a second run gives identical counts
        out2 = bpe_token_counts(ds, num_merges=32, vocab_words=500).to_pandas()
        a = out.sort_values("doc_id", ignore_index=True)
        b = out2.sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
class TestPerplexityEmptyRef:
    def test_missing_reference_language_scores_zero(self):
        """No reference slice → uniform LM with NLL 0, matching the SQL
        oracle's coalesce(sum(c), 0) path — parity, not a crash."""
        import ray.data

        from pdf_parser_ray.stages.textstage import lm_perplexity

        sf = "/root/testdata/sf0.001"
        ds = ray.data.read_parquet(f"{sf}/documents.parquet",
                                   columns=["doc_id", "text", "lang"])
        out = lm_perplexity(ds, ref_lang="zz").to_pandas()
        assert len(out) > 0
        assert (out["nll_milli"] == 0).all()
