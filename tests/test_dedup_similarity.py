"""Dedup + similarity stages under Ray, verified against exact driver-side
oracles (numpy / duckdb-free recomputation)."""

import numpy as np
import pandas as pd
import pytest

import pyarrow as pa


@pytest.fixture(scope="module")
def dup_docs(ray_session):
    """Small corpus with planted exact + near duplicates."""
    import ray.data

    base = " ".join(f"tok{i}" for i in range(300))
    near = " ".join(f"tok{i}" for i in range(295)) + " x y z q r"  # ~98% shingle overlap
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},            # exact dup of 1
        {"doc_id": 3, "text": near},            # near dup of 1
        {"doc_id": 4, "text": "completely different content entirely here"},
        {"doc_id": 5, "text": " ".join(f"other{i}" for i in range(300))},
    ]
    return ray.data.from_items(rows)


class TestExactDedup:
    def test_survivors(self, dup_docs):
        from pdf_parser_ray.stages.dedup import exact_dedup

        out = exact_dedup(dup_docs).to_pandas()
        assert sorted(out["doc_id"]) == [1, 3, 4, 5]  # doc 2 deduped into 1

    def test_hash_is_full_sha256(self, dup_docs):
        from pdf_parser_ray.stages.dedup import exact_dedup
        import hashlib

        out = exact_dedup(dup_docs).to_pandas()
        row = out[out["doc_id"] == 4].iloc[0]
        expect = hashlib.sha256(
            "completely different content entirely here".encode()).hexdigest()
        assert row["content_hash"] == expect


class TestExactDedupIds:
    def test_matches_exact_dedup(self, dup_docs):
        from pdf_parser_ray.stages.dedup import exact_dedup, exact_dedup_ids

        full = exact_dedup(dup_docs).to_pandas()
        slim = exact_dedup_ids(dup_docs).to_pandas()
        a = full[["doc_id", "content_hash"]].sort_values("doc_id", ignore_index=True)
        b = slim[["doc_id", "content_hash"]].sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_no_payload_in_shuffle_stage(self, dup_docs):
        """The dataset feeding the groupby exchange must not carry text."""
        from pdf_parser_ray.stages.dedup import _slim_hash_parts

        parts = _slim_hash_parts(dup_docs)
        names = parts.schema().names
        assert "text" not in names
        assert set(names) == {"doc_id", "content_hash", "dedup_part"}

    def test_keep_cols_ride_along(self, dup_docs):
        from pdf_parser_ray.stages.dedup import exact_dedup_ids

        with_len = dup_docs.map_batches(
            lambda df: df.assign(n_chars=df["text"].str.len()),
            batch_format="pandas")
        out = exact_dedup_ids(with_len, keep_cols=("n_chars",)).to_pandas()
        assert sorted(out["doc_id"]) == [1, 3, 4, 5]
        row = out[out["doc_id"] == 4].iloc[0]
        assert row["n_chars"] == len("completely different content entirely here")

    def test_semi_join_returns_full_rows(self, dup_docs):
        from pdf_parser_ray.stages.dedup import exact_dedup_semi

        out = exact_dedup_semi(dup_docs).to_pandas()
        assert sorted(out["doc_id"]) == [1, 3, 4, 5]
        assert "text" in out.columns
        assert out[out["doc_id"] == 5]["text"].iloc[0].startswith("other0 ")


class TestMinHashDedup:
    def test_finds_exact_and_near(self, dup_docs):
        from pdf_parser_ray.stages.dedup import minhash_dedup_edges

        edges = minhash_dedup_edges(dup_docs, threshold=0.7).to_pandas()
        pairs = {(int(r.doc_id), int(r.dup_of)) for r in edges.itertuples()}
        assert (2, 1) in pairs
        assert (3, 1) in pairs
        assert not any(d in (4, 5) for d, _ in pairs)


class TestMinHashSlimBands:
    def test_band_rows_carry_no_signature(self, ray_session):
        """The band exchange must be slim: (band_key, doc_id) only."""
        import ray.data
        from pdf_parser_ray.stages.dedup import BandExplode, MinHashSketch

        ds = ray.data.from_items([{"doc_id": 1, "text": "a b c d e f g"}])
        sketched = ds.map_batches(MinHashSketch, batch_format="pyarrow",
                                  concurrency=1)
        bands = sketched.map_batches(
            BandExplode, fn_constructor_kwargs={"id_col": "doc_id"},
            batch_format="pyarrow", concurrency=1)
        assert set(bands.schema().names) == {"band_key", "doc_id"}

    def test_pinned_sketch_excludes_payload(self, ray_session):
        """The materialized sketch pin must hold ONLY (id, minhash_sig) —
        never the text payload (at 100 TB the payload pin would be
        corpus-sized)."""
        import ray.data
        from pdf_parser_ray.stages.dedup import _sketch_slim

        ds = ray.data.from_items(
            [{"doc_id": i, "text": "a b c d e f g", "extra": "x" * 100}
             for i in range(4)])
        pinned = _sketch_slim(ds, text_col="text", id_col="doc_id",
                              num_perm=32, concurrency=None, sketch="crc32")
        assert set(pinned.schema().names) == {"doc_id", "minhash_sig"}

    def test_verify_rejects_low_agreement(self, ray_session):
        """Docs sharing one band but < threshold overall agreement must not
        become an edge (the sig-join verify stage does real work)."""
        import ray.data
        from pdf_parser_ray.stages.dedup import minhash_dedup_edges

        base = " ".join(f"tok{i}" for i in range(100))
        half = " ".join(f"tok{i}" for i in range(50)) + " " + \
            " ".join(f"zz{i}" for i in range(50))
        ds = ray.data.from_items([{"doc_id": 1, "text": base},
                                  {"doc_id": 2, "text": half}])
        strict = minhash_dedup_edges(ds, threshold=0.95).to_pandas()
        assert len(strict) == 0


class TestNgramJaccardDedup:
    def test_exact_dup_linked_dissimilar_not(self, dup_docs):
        from pdf_parser_ray.stages.dedup import ngram_jaccard_dedup_edges

        edges = ngram_jaccard_dedup_edges(dup_docs, threshold=0.5).to_pandas()
        pairs = {(int(r.doc_id), int(r.dup_of)) for r in edges.itertuples()}
        assert (2, 1) in pairs  # exact duplicate
        assert not any(d in (4, 5) for d, _ in pairs)  # unrelated docs

    def test_join_fallback_equals_broadcast(self, dup_docs):
        from pdf_parser_ray.stages.dedup import ngram_jaccard_dedup_edges

        a = ngram_jaccard_dedup_edges(dup_docs, threshold=0.5).to_pandas()
        b = ngram_jaccard_dedup_edges(dup_docs, threshold=0.5,
                                      broadcast_limit=0).to_pandas()
        key = lambda df: sorted(map(tuple, df[["doc_id", "dup_of"]].to_numpy()))
        assert key(a) == key(b)

    def test_threshold_is_exact_jaccard(self, ray_session):
        """Two docs sharing a band but with low exact n-gram Jaccard must
        be rejected — the verify is exact, not sketch agreement."""
        import ray.data
        from pdf_parser_ray.stages.dedup import ngram_jaccard_dedup_edges

        base = " ".join(f"tok{i}" for i in range(60))
        half = " ".join(f"tok{i}" for i in range(30)) + " " + \
            " ".join(f"zz{i}" for i in range(30))
        ds = ray.data.from_items([{"doc_id": 1, "text": base},
                                  {"doc_id": 2, "text": half}])
        strict = ngram_jaccard_dedup_edges(ds, threshold=0.95).to_pandas()
        assert len(strict) == 0


class TestConnectedComponents:
    def test_chain_merges_to_one_component(self, ray_session):
        """A~B~C with A!~C: one-round propagation under-merges; CC must not."""
        import ray.data
        from pdf_parser_ray.stages.dedup import connected_components

        edges = ray.data.from_items([
            {"doc_id": "B", "dup_of": "A"},
            {"doc_id": "C", "dup_of": "B"},
            {"doc_id": "E", "dup_of": "D"},   # separate component
        ])
        out = connected_components(edges).to_pandas()
        comp = dict(zip(out["doc_id"], out["component_id"]))
        assert comp["A"] == comp["B"] == comp["C"] == "A"
        assert comp["D"] == comp["E"] == "D"

    def test_long_chain_converges(self, ray_session):
        import ray.data
        from pdf_parser_ray.stages.dedup import connected_components

        n = 12
        edges = ray.data.from_items([
            {"doc_id": f"n{i + 1:02d}", "dup_of": f"n{i:02d}"} for i in range(n)
        ])
        out = connected_components(edges).to_pandas()
        assert set(out["component_id"]) == {"n00"}
        assert len(out) == n + 1

    def test_int_ids(self, ray_session):
        import ray.data
        from pdf_parser_ray.stages.dedup import connected_components

        edges = ray.data.from_items([{"doc_id": 5, "dup_of": 3},
                                     {"doc_id": 3, "dup_of": 1}])
        out = connected_components(edges).to_pandas()
        assert set(out["component_id"]) == {1}


class TestSimHashDedup:
    def test_exact_dup_found(self, dup_docs):
        from pdf_parser_ray.stages.dedup import simhash_dedup_edges

        edges = simhash_dedup_edges(dup_docs).to_pandas()
        pairs = {(int(r.doc_id), int(r.dup_of)) for r in edges.itertuples()}
        assert (2, 1) in pairs


class TestBruteForceTopK:
    @pytest.fixture(scope="class")
    def vectors(self):
        rng = np.random.default_rng(7)
        return rng.standard_normal((200, 16))

    def test_matches_numpy_oracle(self, ray_session, vectors):
        import ray.data
        from pdf_parser_ray.stages.similarity import brute_force_topk

        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": vectors[i].tolist()} for i in range(len(vectors))])
        q_ids, q = [0, 1], vectors[:2]
        out = brute_force_topk(ds, q_ids, q, k=5, concurrency=2).to_pandas()

        unit = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
        for qi in q_ids:
            sims = unit @ unit[qi]
            order = np.lexsort((np.arange(len(sims)), -sims))[:5]
            got = out[out["query_id"] == qi].sort_values("rank")["neighbor_id"].tolist()
            assert got == order.tolist()
            assert out[out["query_id"] == qi]["rank"].tolist() == [1, 2, 3, 4, 5]

    def test_ivf_recall_on_self(self, ray_session, vectors):
        import ray.data
        from pdf_parser_ray.stages.similarity import ivf_topk, kmeans_centroids

        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": vectors[i].tolist()} for i in range(len(vectors))])
        cents = kmeans_centroids(vectors, n_centroids=4)
        out = ivf_topk(ds, [3], vectors[3:4], cents, k=1, nprobe=2).to_pandas()
        # the query vector itself lives in a probed list → rank-1 self match
        assert out.iloc[0]["neighbor_id"] == 3

    def test_ivf_recall_vs_brute_force(self, ray_session, vectors):
        """Quantitative quality gate for the approximate path: top-10 recall
        vs exact brute force must clear 0.7 with nprobe=4 of 8 lists on
        RANDOM vectors — IVF's worst case, since true neighbors scatter
        across lists (clustered real data recalls far higher)."""
        import ray.data
        from pdf_parser_ray.stages.similarity import (brute_force_topk,
                                                      ivf_topk,
                                                      kmeans_centroids)

        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": vectors[i].tolist()}
             for i in range(len(vectors))])
        q_ids = [0, 1, 2, 3, 4]
        q = vectors[:5]
        cents = kmeans_centroids(vectors, n_centroids=8)
        exact = brute_force_topk(ds, q_ids, q, k=10, concurrency=2).to_pandas()
        approx = ivf_topk(ds, q_ids, q, cents, k=10, nprobe=4).to_pandas()
        recalls = []
        for qi in q_ids:
            e = set(exact[exact["query_id"] == qi]["neighbor_id"])
            a = set(approx[approx["query_id"] == qi]["neighbor_id"])
            recalls.append(len(e & a) / len(e))
        assert sum(recalls) / len(recalls) >= 0.7, recalls


class TestNgramJaccard:
    def test_pairs(self):
        from pdf_parser_ray.stages.dedup import ngram_jaccard_pairs

        sims = ngram_jaccard_pairs(["abcdef", "xyz"], ["abcdef", "abc"])
        assert sims[0] == 1.0 and sims[1] == 0.0


class TestVerifyFallbackPaths:
    def test_minhash_join_fallback_equals_broadcast(self, dup_docs):
        """broadcast_limit=0 forces the bucket-join verify; edge set must
        equal the broadcast path's."""
        from pdf_parser_ray.stages.dedup import minhash_dedup_edges

        a = minhash_dedup_edges(dup_docs, threshold=0.7).to_pandas()
        b = minhash_dedup_edges(dup_docs, threshold=0.7,
                                broadcast_limit=0).to_pandas()
        pa_ = {(int(r.doc_id), int(r.dup_of)) for r in a.itertuples()}
        pb_ = {(int(r.doc_id), int(r.dup_of)) for r in b.itertuples()}
        assert pa_ == pb_ and len(pa_) > 0

    def test_embedding_join_fallback_equals_broadcast(self, ray_session):
        import numpy as np
        import ray.data
        from pdf_parser_ray.stages.dedup import embedding_neardup_edges

        rng = np.random.default_rng(5)
        base = rng.standard_normal((40, 16))
        # plant near-dups: rows 20..29 are tiny perturbations of rows 0..9
        base[20:30] = base[0:10] + 0.01 * rng.standard_normal((10, 16))
        rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)]
        ds = ray.data.from_items(rows)
        a = embedding_neardup_edges(ds, threshold=0.98).to_pandas()
        b = embedding_neardup_edges(ds, threshold=0.98,
                                    broadcast_limit=0).to_pandas()

        def pairs(df):
            if "vec_id" not in df.columns:
                return set()
            return {(int(r.vec_id), int(r.dup_of)) for r in df.itertuples()}

        assert pairs(a) == pairs(b)
        assert len(pairs(a)) > 0  # planted dups found


class TestDistinctEdges:
    """_distinct_edges: the size-gated coalesce fast path and the
    coarse-partition scale path must produce identical distinct sets."""

    def _edges(self):
        import ray.data

        rows = [{"doc_id": d, "dup_of": a}
                for d, a in [(2, 1), (3, 1), (2, 1), (5, 4), (3, 1), (6, 4)]]
        return ray.data.from_items(rows)

    def test_paths_agree(self, ray_session):
        from pdf_parser_ray.stages.dedup import _distinct_edges

        key = lambda ds: sorted(
            map(tuple, ds.to_pandas()[["doc_id", "dup_of"]].to_numpy()))
        fast = _distinct_edges(self._edges())                     # coalesce path
        slow = _distinct_edges(self._edges(), small_limit=0)      # partition path
        want = [(2, 1), (3, 1), (5, 4), (6, 4)]
        assert key(fast) == want
        assert key(slow) == want

    def test_empty(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.dedup import _distinct_edges

        empty = ray.data.from_pandas(
            pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "dup_of": pd.Series(dtype="int64")}))
        out = _distinct_edges(empty)
        assert out.count() == 0


class TestLshTopK:
    @pytest.fixture(scope="class")
    def vectors(self):
        rng = np.random.default_rng(11)
        return rng.standard_normal((200, 16))

    def test_self_match_and_candidate_exactness(self, ray_session, vectors):
        """A query always shares every band with itself → rank-1 self match;
        ranking among candidates is exact cosine (self = 1.0 at rank 1)."""
        import ray.data

        from pdf_parser_ray.stages.similarity import lsh_topk

        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": vectors[i].tolist()}
             for i in range(len(vectors))])
        out = lsh_topk(ds, [7], vectors[7:8], k=3).to_pandas()
        first = out.sort_values("rank").iloc[0]
        assert first["neighbor_id"] == 7 and first["rank"] == 1

    def test_lsh_recall_vs_brute_force(self, ray_session):
        """Quantitative gate for the LSH-bucketed path on PLANTED
        high-cosine neighbors (the regime sign-LSH is for — a neighbor at
        angle θ shares an 8-bit band w.p. (1−θ/π)^8, so uniformly random
        directions are its adversarial case and recall there is
        structurally low): top-10 recall vs exact brute force ≥ 0.8 when
        each query's true neighbors sit at cosine ≈ 0.97."""
        import ray.data

        from pdf_parser_ray.stages.similarity import brute_force_topk, lsh_topk

        rng = np.random.default_rng(23)
        rows, bases = [], []
        vid = 0
        for c in range(20):
            base = rng.standard_normal(16)
            base /= np.linalg.norm(base)
            bases.append((vid, base))
            for _ in range(10):  # cluster of 10 incl. near-copies
                noisy = base + 0.06 * rng.standard_normal(16)
                rows.append({"vec_id": vid, "embedding": noisy.tolist()})
                vid += 1
        ds = ray.data.from_items(rows)
        q_ids = [b[0] for b in bases[:5]]
        q = np.stack([b[1] for b in bases[:5]])
        exact = brute_force_topk(ds, q_ids, q, k=10, concurrency=2).to_pandas()
        approx = lsh_topk(ds, q_ids, q, k=10, num_bands=4,
                          planes_per_band=8).to_pandas()
        recalls = []
        for qi in q_ids:
            e = set(exact[exact["query_id"] == qi]["neighbor_id"])
            a = set(approx[approx["query_id"] == qi]["neighbor_id"])
            recalls.append(len(e & a) / len(e))
        assert sum(recalls) / len(recalls) >= 0.8, recalls


class TestTopKBoundaryTies:
    def test_tied_cosines_keep_lowest_ids(self, ray_session):
        """30 identical vectors tie at cosine 1.0; the batch kernel must
        keep the LOWEST ids across the k-boundary (oracle order: cosine
        DESC, id ASC) — an argpartition split would pick arbitrary ids."""
        import ray.data

        from pdf_parser_ray.stages.similarity import brute_force_topk, lsh_topk

        vec = np.ones(8)
        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": vec.tolist()} for i in range(30)])
        for fn in (lambda: brute_force_topk(ds, [0], vec[None, :], k=10),
                   lambda: lsh_topk(ds, [0], vec[None, :], k=10)):
            out = fn().to_pandas().sort_values("rank")
            assert out["neighbor_id"].tolist() == list(range(10))


class TestPQ:
    @pytest.fixture
    def vectors(self):
        rng = np.random.default_rng(23)
        return rng.standard_normal((200, 16))

    def test_codebook_shape_and_determinism(self, vectors):
        from pdf_parser_ray.stages.similarity import pq_train

        cb1 = pq_train(vectors, m=4, n_codes=8)
        cb2 = pq_train(vectors, m=4, n_codes=8)
        assert cb1.shape == (4, 8, 4)
        assert np.array_equal(cb1, cb2)

    def test_dim_not_divisible_raises(self, vectors):
        from pdf_parser_ray.stages.similarity import pq_train

        with pytest.raises(ValueError, match="divisible"):
            pq_train(vectors, m=5)

    def test_self_match_rank1(self, ray_session, vectors):
        """The query vector itself quantizes to its own codes → its ADC
        score is maximal among identical-code vectors; with 200 random
        vectors it is the top-1 with overwhelming margin."""
        import ray.data

        from pdf_parser_ray.stages.similarity import pq_topk, pq_train

        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": vectors[i].tolist()}
             for i in range(len(vectors))])
        cb = pq_train(vectors, m=4, n_codes=16)
        out = pq_topk(ds, [7], vectors[7:8], cb, k=3).to_pandas()
        assert out[out["rank"] == 1].iloc[0]["neighbor_id"] == 7

    def test_pq_recall_vs_brute_force(self, ray_session, vectors):
        """Quantitative quality gate: top-10 recall vs exact brute force
        must clear 0.6 at m=4, 16 codes on RANDOM vectors — PQ's worst
        case (no cluster structure for the codebooks to exploit)."""
        import ray.data

        from pdf_parser_ray.stages.similarity import (brute_force_topk,
                                                      pq_topk, pq_train)

        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": vectors[i].tolist()}
             for i in range(len(vectors))])
        q_ids = [0, 1, 2, 3, 4]
        q = vectors[:5]
        cb = pq_train(vectors, m=4, n_codes=16)
        exact = brute_force_topk(ds, q_ids, q, k=10, concurrency=2).to_pandas()
        approx = pq_topk(ds, q_ids, q, cb, k=10).to_pandas()
        recalls = []
        for qi in q_ids:
            e = set(exact[exact["query_id"] == qi]["neighbor_id"])
            a = set(approx[approx["query_id"] == qi]["neighbor_id"])
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.6, recalls


class TestEmptyBatchGuards:
    def test_ann_kernels_tolerate_empty_blocks(self, ray_session):
        """An upstream filter can hand a kernel a zero-row block; np.stack
        would raise 'need at least one array'."""
        import pandas as pd
        import ray as ray_mod

        from pdf_parser_ray.stages.similarity import _BatchTopK

        qref = ray_mod.put({"ids": [0], "vectors": np.ones((1, 4))})
        k = _BatchTopK(qref, k=3, vec_col="embedding", id_col="vec_id")
        out = k(pd.DataFrame({"vec_id": [], "embedding": []}))
        assert len(out) == 0
        assert list(out.columns) == ["query_id", "neighbor_id", "cosine"]


class TestHNSW:
    @pytest.fixture(scope="class")
    def vectors(self):
        rng = np.random.default_rng(7)
        return rng.standard_normal((400, 16))

    def test_index_recall_vs_numpy(self, vectors):
        """Local (no-Ray) quality gate: beam search over the whole set must
        recall >= 0.9 of exact top-10 on random vectors."""
        from pdf_parser_ray.stages.similarity import HNSWIndex, _unit

        idx = HNSWIndex(vectors, np.arange(len(vectors)))
        unit = _unit(vectors)
        recalls = []
        for qi in range(20):
            got, sims = idx.search(vectors[qi], 10)
            truth = np.lexsort((np.arange(len(vectors)),
                                -(unit @ unit[qi])))[:10]
            recalls.append(len(set(map(int, got)) & set(truth.tolist())) / 10)
            # ranking among returned candidates is exact (sim desc, id asc)
            assert sims == sorted(sims, reverse=True)
        assert np.mean(recalls) >= 0.9, recalls

    def test_index_insertion_order_invariant(self, vectors):
        """Levels come from md5(id) and insertion order is pinned by an id
        sort, so a permuted input builds the identical graph."""
        from pdf_parser_ray.stages.similarity import HNSWIndex

        ids = np.arange(len(vectors))
        perm = np.random.default_rng(1).permutation(len(vectors))
        a = HNSWIndex(vectors, ids)
        b = HNSWIndex(vectors[perm], ids[perm])
        for qi in (0, 3, 11):
            ga, sa = a.search(vectors[qi], 10)
            gb, sb = b.search(vectors[qi], 10)
            assert list(map(int, ga)) == list(map(int, gb))
            assert sa == sb

    def test_index_edge_cases(self):
        from pdf_parser_ray.stages.similarity import HNSWIndex

        one = HNSWIndex(np.ones((1, 4)), np.asarray([7]))
        got, sims = one.search(np.ones(4), 5)
        assert list(map(int, got)) == [7] and sims[0] == pytest.approx(1.0)

    def test_hnsw_topk_vs_brute_force(self, ray_session, vectors):
        """Distributed quality gate: sharded-HNSW top-10 recall vs exact
        brute force >= 0.8 with the corpus split across blocks (each shard
        builds its own graph; the bounded per-query reduce merges)."""
        import ray.data

        from pdf_parser_ray.stages.similarity import (brute_force_topk,
                                                      hnsw_topk)

        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": vectors[i].tolist()}
             for i in range(len(vectors))]).repartition(4)
        q_ids = [0, 1, 2, 3, 4]
        q = vectors[:5]
        exact = brute_force_topk(ds, q_ids, q, k=10, concurrency=2).to_pandas()
        approx = hnsw_topk(ds, q_ids, q, k=10, concurrency=2).to_pandas()
        recalls = []
        for qi in q_ids:
            e = set(exact[exact["query_id"] == qi]["neighbor_id"])
            a = set(approx[approx["query_id"] == qi]["neighbor_id"])
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.8, recalls
        # contract columns + rank density
        r0 = approx[approx["query_id"] == 0].sort_values("rank")
        assert r0["rank"].tolist() == list(range(1, len(r0) + 1))


class TestSemDedup:
    """SemDeDup (cluster + within-cluster cosine prune): both gate paths
    agree with a numpy brute-force replay, planted near-dups are dropped,
    and the full pipeline replays in DuckDB at matched scale."""

    @pytest.fixture(scope="class")
    def planted(self):
        rng = np.random.default_rng(9)
        base = rng.standard_normal((60, 16))
        # rows 40..49 are tiny perturbations of rows 0..9 → cosine ~0.99
        base[40:50] = base[0:10] + 0.02 * rng.standard_normal((10, 16))
        return base

    def _replay(self, vectors, cent, tau):
        n = np.linalg.norm(vectors, axis=1)
        n[n == 0] = 1.0
        u = vectors / n[:, None]
        cn = np.linalg.norm(cent, axis=1)
        cn[cn == 0] = 1.0
        assign = np.argmax(u @ (cent / cn[:, None]).T, axis=1)
        keep = {}
        for c in set(assign.tolist()):
            msk = assign == c
            sub, sid = u[msk], np.flatnonzero(msk)
            dup = ((sub @ sub.T >= tau)
                   & (sid[None, :] < sid[:, None])).any(axis=1)
            for i, d in zip(sid, dup):
                keep[int(i)] = (int(assign[i]), not bool(d))
        return keep

    def test_matches_bruteforce_both_paths(self, ray_session, planted):
        import ray.data

        from pdf_parser_ray.stages.dedup import semdedup
        from pdf_parser_ray.stages.similarity import kmeans_centroids

        cent = kmeans_centroids(planted, n_centroids=4)
        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": planted[i].tolist()}
             for i in range(len(planted))]).repartition(3)
        tau = 0.9
        want = self._replay(planted, cent, tau)
        # coalesce path (nrows below gate) and shuffle path (nrows=None)
        for nrows in (len(planted), None):
            got = semdedup(ds, cent, tau=tau, nrows=nrows).to_pandas()
            got_map = {int(r.vec_id): (int(r.cluster), bool(r.semdedup_keep))
                       for r in got.itertuples()}
            assert got_map == want, f"nrows={nrows}"
        # planted perturbed rows 40..49 must be dropped (their source id
        # is smaller), sources 0..9 kept
        assert all(not want[i][1] for i in range(40, 50))
        assert all(want[i][1] for i in range(10))

    def test_sql_parity_matched_scale(self, ray_session):
        """The full Ray query replays bit-for-bit in DuckDB when oracle
        centroids are trained at the SAME scale (the registered oracle
        pins sf0.01 — the driver's gate — like knn_ivf/model_filter)."""
        import duckdb

        import __ray_entry__ as entry

        sf = "/root/testdata/sf0.001"
        got = entry._q_semdedup(sf).to_pandas().sort_values(
            "vec_id", ignore_index=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{sf}/embeddings.parquet')")
        exp = con.execute(entry._semdedup_sql(sf)).fetchdf().sort_values(
            "vec_id", ignore_index=True)
        pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)
        # a meaningful split: some dropped, some kept
        assert 0 < got["semdedup_keep"].sum() < len(got)


class TestPPJoin:
    @staticmethod
    def _brute(rows, threshold, width):
        from fractions import Fraction

        from pdf_parser_ray.stages.dedup import _pp_shingle_set

        fr = Fraction(str(threshold))
        sets = {r["doc_id"]: _pp_shingle_set(r["text"], width) for r in rows}
        ids = sorted(sets)
        out = []
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                inter = len(sets[a] & sets[b])
                union = len(sets[a]) + len(sets[b]) - inter
                if union > 0 and fr.denominator * inter >= \
                        fr.numerator * union:
                    out.append((a, b))
        return sorted(out)

    def test_complete_vs_bruteforce(self, ray_session):
        """THE family differentiator: every qualifying pair must be
        present — no LSH recall allowance. Random corpus with graded
        overlap levels straddling the threshold."""
        import ray.data

        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(120)]
        rows = []
        base = list(rng.choice(vocab, 60))
        for d in range(40):
            mut = list(base)
            n_mut = int(rng.integers(0, 40))     # 0 → exact dup .. 40 → far
            for _ in range(n_mut):
                mut[int(rng.integers(0, 60))] = str(rng.choice(vocab))
            rows.append({"doc_id": d, "text": " ".join(mut)})
        ds = ray.data.from_items(rows)

        from pdf_parser_ray.stages.dedup import ppjoin_pairs

        got = ppjoin_pairs(ds, threshold=0.6, width=3).to_pandas()
        got_pairs = sorted(zip(got["doc_id"], got["dup_of"]))
        want = self._brute(rows, 0.6, 3)
        assert got_pairs == want
        assert len(want) > 0          # the fixture must exercise matches

    def test_scale_paths_agree(self, ray_session):
        """Forcing the df hash-join rebuild (df_broadcast_limit=0), the
        coarse posting partition (gate 0) and the verify bucket-join
        (broadcast_limit=0) must reproduce the broadcast answer."""
        import ray.data

        import pdf_parser_ray.stages.dedup as dd

        rng = np.random.default_rng(9)
        vocab = [f"w{i}" for i in range(80)]
        base = list(rng.choice(vocab, 50))
        rows = []
        for d in range(25):
            mut = list(base)
            for _ in range(int(rng.integers(0, 25))):
                mut[int(rng.integers(0, 50))] = str(rng.choice(vocab))
            rows.append({"doc_id": d, "text": " ".join(mut)})
        ds = ray.data.from_items(rows)

        fast = dd.ppjoin_pairs(ds, threshold=0.6).to_pandas()
        fast_pairs = sorted(zip(fast["doc_id"], fast["dup_of"]))

        old_gate = dd._COALESCE_BAND_LIMIT
        try:
            dd._COALESCE_BAND_LIMIT = 0
            slow = dd.ppjoin_pairs(ds, threshold=0.6,
                                   df_broadcast_limit=0,
                                   broadcast_limit=0).to_pandas()
        finally:
            dd._COALESCE_BAND_LIMIT = old_gate
        slow_pairs = sorted(zip(slow["doc_id"], slow["dup_of"]))
        assert slow_pairs == fast_pairs and len(fast_pairs) > 0

    def test_exact_rational_threshold_boundary(self, ray_session):
        """A pair EXACTLY at the threshold must be kept (>=, not >), and
        one shingle below must be dropped — float comparison would wobble
        here; the Fraction cross-multiply must not."""
        import ray.data

        from pdf_parser_ray.stages.dedup import ppjoin_pairs

        # doc 1: shingles from 12 words -> 10 shingles; doc 2 shares
        # exactly 6 of them with 2 extra: J = 6 / (10 + 8 - 6) = 0.5
        w = [f"t{i}" for i in range(12)]
        a = " ".join(w)
        b = " ".join(w[:8] + ["zz", "yy", "xx", "ww"])
        ds = ray.data.from_items([{"doc_id": 1, "text": a},
                                  {"doc_id": 2, "text": b}])
        from pdf_parser_ray.stages.dedup import _pp_shingle_set
        sa, sb = _pp_shingle_set(a, 3), _pp_shingle_set(b, 3)
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        from fractions import Fraction
        j = Fraction(inter, union)

        at = ppjoin_pairs(ds, threshold=float(j), width=3).to_pandas()
        assert sorted(zip(at["doc_id"], at["dup_of"])) == [(1, 2)]
        above = ppjoin_pairs(
            ds, threshold=float(j) + 1e-9, width=3).to_pandas()
        assert len(above) == 0
