"""Trained model-based filter (stages/classifier.py): deterministic
training, SQL-exact feature arithmetic, bitwise logit parity vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_parser_ray.stages.classifier import (FEATURE_COLS, extract_features,
                                              model_filter_sql, score_model,
                                              train_model,
                                              weak_labels_english,
                                              weak_labels_quality)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text", "lang"]).to_pandas()


class TestFeatures:
    def test_feature_columns_and_dtypes(self, docs):
        f = extract_features(docs["text"])
        assert list(f.columns) == list(FEATURE_COLS)
        assert all(str(f[c].dtype) == "int64" for c in FEATURE_COLS)

    def test_features_match_sql(self, docs):
        """Every feature column replays bit-for-bit in DuckDB (the inner
        SELECT of model_filter_sql)."""
        con = duckdb.connect()
        con.register("documents", docs[["doc_id", "text"]])
        # weights of zero: the oracle output exposes the feature block via
        # score_milli = floor(0) = 0; instead pull the inner select directly
        sql = model_filter_sql([0.0] * (1 + len(FEATURE_COLS)))
        inner = sql[sql.index("(SELECT") + 1:-1]
        got = con.execute(inner).df().sort_values("doc_id", ignore_index=True)
        exp = extract_features(docs["text"])
        exp.insert(0, "doc_id", docs["doc_id"])
        exp = exp.sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(exp, got[exp.columns], check_dtype=False)

    def test_empty_and_null_text(self):
        f = extract_features(pd.Series(["", None, "ab c"]))
        assert f["n_tokens"].tolist() == [0, 0, 2]
        assert f["mtl_milli"].tolist() == [0, 0, (1000 * 3) // 2]


class TestTraining:
    def test_deterministic(self, docs):
        a = train_model(docs["text"])
        b = train_model(docs["text"])
        assert a == b

    def test_weak_label_rules(self, docs):
        y_en = weak_labels_english(docs["text"])
        assert set(np.unique(y_en)) <= {0.0, 1.0}
        y_q = weak_labels_quality(extract_features(docs["text"]))
        assert set(np.unique(y_q)) <= {0.0, 1.0}

    def test_learns_separable_labels(self):
        """On a cleanly separable weak signal (many-tokens vs few-tokens)
        the folded raw-feature model must classify the training set."""
        short = ["a b"] * 40
        long_ = [" ".join(["token"] * 60)] * 40
        texts = pd.Series(short + long_)
        labels = np.array([0.0] * 40 + [1.0] * 40)
        w = train_model(texts, labels)
        feats = extract_features(texts)
        z = np.full(len(texts), w[0])
        for wi, col in zip(w[1:], FEATURE_COLS):
            z = z + wi * feats[col].to_numpy().astype(np.float64)
        assert ((z >= 0) == (labels == 1.0)).all()

    def test_weight_arity_checked(self, ray_session):
        import ray.data

        ds = ray.data.from_items([{"doc_id": "d", "text": "x"}])
        with pytest.raises(ValueError):
            score_model(ds, (0.0, 1.0))


class TestScoringParity:
    def test_ray_scoring_matches_duckdb_bitwise(self, ray_session, docs):
        """The full distributed pass vs the SQL replay: identical weights,
        identical feature arithmetic, identical logit term order →
        floor(1000*z) and z>=0 agree on every row."""
        import ray.data

        w = train_model(docs["text"].head(512))
        ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(3)
        got = score_model(ds, w).to_pandas().sort_values(
            "doc_id", ignore_index=True)
        con = duckdb.connect()
        con.register("documents", docs[["doc_id", "text"]])
        exp = con.execute(model_filter_sql(w)).df().sort_values(
            "doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)

    def test_model_agrees_with_weak_labels(self, docs):
        """Quality gate: the trained filter reproduces >= 90% of its weak
        labels on the corpus (it is a smooth fit of the vote rule)."""
        w = train_model(docs["text"].head(512))
        feats = extract_features(docs["text"])
        z = np.full(len(docs), w[0])
        for wi, col in zip(w[1:], FEATURE_COLS):
            z = z + wi * feats[col].to_numpy().astype(np.float64)
        y = weak_labels_english(docs["text"]).astype(bool)
        assert ((z >= 0) == y).mean() >= 0.9
