"""Similarity search over an embedding column (list<float>).

  - ``brute_force_topk``: exact cosine top-k. The query matrix is broadcast
    ONCE via ``ray.put`` and read in each task (never re-shipped per batch);
    each batch computes a float64 matmul and emits only its LOCAL top-k rows
    per query (partial top-k combiner), so the shuffle that follows moves
    ≤ k rows per (query, batch) — not the corpus. A final per-query
    ``map_groups`` reduces partials to the global top-k.
  - ``ivf_topk``: IVF-style scale path — vectors bucketed to seeded
    centroids (one cheap pass), queries probe the ``nprobe`` nearest
    centroid buckets only. Approximate: recall depends on nprobe.

Cosine is computed in float64 with unit-normalized rows; ties broken by
ascending id (pinned for oracle comparison).

Actor pools use AUTOSCALING concurrency (min, max) = (1, 4): a fixed-size
pool can deadlock a small cluster — with num_cpus=4 and a single-block
input, 4 idle pool actors pin every CPU and the downstream sort never
gets a slot (observed, not hypothetical). Autoscaling spawns actors only
while input blocks are pending and releases the CPUs for the reduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from ..config import COALESCE_ROW_LIMIT


def _unit(mat: np.ndarray) -> np.ndarray:
    mat = mat.astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


class _BatchTopK:
    """Per-batch partial top-k against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        q = ray.get(queries_ref)  # broadcast read: once per actor
        self.q_ids = np.asarray(q["ids"])
        self.q_unit = _unit(np.asarray(q["vectors"]))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):  # np.stack needs >= 1 array
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        mat = _unit(np.stack(batch[self.vec_col].to_numpy()))
        ids = batch[self.id_col].to_numpy()
        sims = self.q_unit @ mat.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # FULL (sim desc, id asc) lexsort BEFORE truncating: a cosine
            # tie straddling the k-boundary must keep the lower id (the
            # oracle's ORDER BY cosine DESC, id ASC) — argpartition splits
            # boundary ties arbitrarily and could drop it for good
            sel = np.lexsort((ids, -row))[:k]
            out_q.extend([self.q_ids[qi]] * len(sel))
            out_id.extend(ids[sel].tolist())
            out_sim.extend(row[sel].tolist())
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_id, "cosine": out_sim})



def _reduce_topk(partials, k: int):
    """Global per-query top-k over the partial rows. The partials are
    bounded by construction (≤ k rows per (query, batch)), so they are
    materialized (pin is partial-scale, never the corpus) and, below the
    coalesce gate, reduced in ONE kernel on one block — no sort shuffle
    (~2 s fixed barrier cost). Above the gate (massive block counts), the
    per-query groupby exchange is unchanged."""
    partials = partials.materialize()

    def reduce_all(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "cosine", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
        out = df.groupby("query_id", sort=False).head(k).copy()
        out["rank"] = (out.groupby("query_id").cumcount() + 1).astype("int64")
        return out

    if 0 < partials.count() <= COALESCE_ROW_LIMIT:
        return partials.repartition(1).map_batches(
            reduce_all, batch_format="pandas", batch_size=None)

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g

    return partials.groupby("query_id").map_groups(reduce_topk, batch_format="pandas")


def brute_force_topk(ds, query_ids: list, query_vectors: np.ndarray, k: int = 10,
                     *, vec_col: str = "embedding", id_col: str = "vec_id",
                     concurrency=(1, 4)):
    """Exact cosine top-k of each query against the whole dataset.

    Returns a Dataset with columns (query_id, neighbor_id, rank, cosine).
    """
    queries_ref = ray.put({"ids": list(query_ids), "vectors": np.asarray(query_vectors)})

    partials = ds.map_batches(
        _BatchTopK,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k,
                               "vec_col": vec_col, "id_col": id_col},
        batch_format="pandas", batch_size=4096, concurrency=concurrency,
    )

    return _reduce_topk(partials, k)


def kmeans_centroids(sample: np.ndarray, n_centroids: int, iters: int = 5,
                     seed: int = 42) -> np.ndarray:
    """Tiny deterministic k-means (driver-side, on a sample) for IVF lists."""
    rng = np.random.default_rng(seed)
    sample = _unit(np.asarray(sample))
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_topk(ds, query_ids: list, query_vectors: np.ndarray, centroids: np.ndarray,
             k: int = 10, nprobe: int = 2, *, vec_col: str = "embedding",
             id_col: str = "vec_id", concurrency=(1, 4)):
    """IVF-bucketed approximate top-k: compare each query only against
    vectors whose nearest centroid is among the query's nprobe centroids."""
    cent_unit = _unit(np.asarray(centroids))
    q_unit = _unit(np.asarray(query_vectors))
    probe_lists = np.argsort(-(q_unit @ cent_unit.T), axis=1)[:, :nprobe]
    # query set per centroid-list, broadcast once
    per_list: dict[int, list[int]] = {}
    for qi, lists in enumerate(probe_lists):
        for c in lists:
            per_list.setdefault(int(c), []).append(qi)
    bundle_ref = ray.put({"centroids": cent_unit, "per_list": per_list,
                          "q_ids": list(query_ids), "q_unit": q_unit})

    class ListTopK:
        def __init__(self):
            b = ray.get(bundle_ref)
            self.cent = b["centroids"]
            self.per_list = b["per_list"]
            self.q_ids = b["q_ids"]
            self.q_unit = b["q_unit"]

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):  # np.stack needs >= 1 array
                return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
            mat = _unit(np.stack(batch[vec_col].to_numpy()))
            ids = batch[id_col].to_numpy()
            assign = np.argmax(mat @ self.cent.T, axis=1)
            out_q, out_id, out_sim = [], [], []
            for c, q_idx in self.per_list.items():
                mask = assign == c
                if not mask.any():
                    continue
                sub, sub_ids = mat[mask], ids[mask]
                sims = self.q_unit[q_idx] @ sub.T
                kk = min(k, sims.shape[1])
                for row_i, qi in enumerate(q_idx):
                    row = sims[row_i]
                    # full lexsort before truncation (boundary-tie order;
                    # see _BatchTopK)
                    sel = np.lexsort((sub_ids, -row))[:kk]
                    out_q.extend([self.q_ids[qi]] * len(sel))
                    out_id.extend(sub_ids[sel].tolist())
                    out_sim.extend(row[sel].tolist())
            return pd.DataFrame({"query_id": out_q, "neighbor_id": out_id, "cosine": out_sim})

    partials = ds.map_batches(ListTopK, batch_format="pandas", batch_size=4096,
                              concurrency=concurrency)

    return _reduce_topk(partials, k)


def lsh_planes(dim: int, num_bands: int = 4, planes_per_band: int = 8,
               seed: int = 7) -> np.ndarray:
    """Deterministic hyperplane bank (num_bands, planes_per_band, dim) for
    sign-bit LSH band codes (Charikar 2002 random hyperplanes)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_bands, planes_per_band, dim))


def _band_codes(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, dim) raw vectors → (n, num_bands) int codes: bit j of band b is
    sign(dot(planes[b, j], vec)) >= 0. Raw (un-normalized) dots so the
    DuckDB oracle can replay with list_dot_product directly."""
    nb, ppb, _ = planes.shape
    dots = np.einsum("nd,bpd->nbp", mat.astype(np.float64), planes)
    bits = (dots >= 0).astype(np.int64)
    weights = (1 << np.arange(ppb, dtype=np.int64))
    return (bits * weights).sum(axis=2)


def lsh_topk(ds, query_ids: list, query_vectors: np.ndarray, k: int = 10,
             *, num_bands: int = 4, planes_per_band: int = 8, seed: int = 7,
             vec_col: str = "embedding", id_col: str = "vec_id",
             concurrency=(1, 4)):
    """LSH-bucketed approximate top-k (the non-IVF scale path): a vector is
    scored against a query ONLY if they share at least one hyperplane
    band code, so per-batch work is candidates × dim instead of
    corpus × dim. Same partial-top-k combiner + per-query reduce shape as
    brute_force_topk: the shuffle moves ≤ k rows per (query, batch).
    Approximate — recall is the band-collision probability (tested ≥ 0.8
    vs brute force at the default 4×8 configuration); exactness of the
    ranking among candidates is preserved (cosine desc, id asc).
    """
    q_raw = np.asarray(query_vectors, dtype=np.float64)
    planes = lsh_planes(q_raw.shape[1], num_bands, planes_per_band, seed)
    bundle_ref = ray.put({
        "q_ids": list(query_ids), "q_unit": _unit(q_raw),
        "q_codes": _band_codes(q_raw, planes), "planes": planes})

    class BandTopK:
        def __init__(self):
            b = ray.get(bundle_ref)  # broadcast: once per actor/worker
            self.q_ids, self.q_unit = b["q_ids"], b["q_unit"]
            self.q_codes, self.planes = b["q_codes"], b["planes"]

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):  # np.stack needs >= 1 array
                return pd.DataFrame({"query_id": [], "neighbor_id": [],
                                     "cosine": []})
            raw = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
            ids = batch[id_col].to_numpy()
            codes = _band_codes(raw, self.planes)           # (n, B)
            # (n, n_q): share >= 1 band code
            cand = (codes[:, None, :] == self.q_codes[None, :, :]).any(axis=2)
            mat = _unit(raw)
            out_q, out_id, out_sim = [], [], []
            for qi in range(self.q_codes.shape[0]):
                rows = np.flatnonzero(cand[:, qi])
                if not len(rows):
                    continue
                sims = self.q_unit[qi] @ mat[rows].T
                # full lexsort before truncation (boundary-tie order;
                # see _BatchTopK)
                sel = np.lexsort((ids[rows], -sims))[:min(k, len(rows))]
                out_q.extend([self.q_ids[qi]] * len(sel))
                out_id.extend(ids[rows][sel].tolist())
                out_sim.extend(sims[sel].tolist())
            return pd.DataFrame({"query_id": out_q, "neighbor_id": out_id,
                                 "cosine": out_sim})

    partials = ds.map_batches(BandTopK, batch_format="pandas", batch_size=4096,
                              concurrency=concurrency)

    return _reduce_topk(partials, k)


def _kmeans_l2(x: np.ndarray, n: int, iters: int, seed: int) -> np.ndarray:
    """Tiny deterministic L2 k-means for PQ codebooks (driver-side sample)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(x), size=min(n, len(x)), replace=False)
    cent = x[np.sort(idx)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = np.argmin(d, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_train(sample: np.ndarray, *, m: int = 8, n_codes: int = 16,
             iters: int = 5, seed: int = 11) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, public): split the
    unit-normalized vector into ``m`` contiguous subspaces and L2-k-means
    each on a driver-side sample → (m, n_codes, dim/m). Deterministic
    (seeded per subspace) so the SQL oracle can retrain + inline them."""
    sample = _unit(np.asarray(sample))
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return np.stack([
        _kmeans_l2(sample[:, j * sub:(j + 1) * sub], n_codes, iters, seed + j)
        for j in range(m)
    ])


def pq_topk(ds, query_ids: list, query_vectors: np.ndarray,
            codebooks: np.ndarray, k: int = 10, *,
            vec_col: str = "embedding", id_col: str = "vec_id",
            concurrency=(1, 4)):
    """Product-quantization approximate top-k (the memory-bound scale path:
    a 64-dim float32 vector compresses to m=8 one-byte codes).

    Each batch encodes its vectors (nearest codebook entry per subspace,
    L2, lowest-code ties — matches the oracle's row_number order) and
    scores every query via the asymmetric-distance LUT
    (query-subspace · code inner products, computed once per actor), so
    per-row work is m lookups instead of a dim-wide dot. Same partial
    top-k combiner + bounded per-query reduce as brute_force_topk; the
    ``cosine`` output column holds the PQ-APPROXIMATED cosine (query is
    exact, corpus side quantized)."""
    codebooks = np.asarray(codebooks, dtype=np.float64)
    q_unit = _unit(np.asarray(query_vectors))
    bundle_ref = ray.put({"codebooks": codebooks, "q_ids": list(query_ids),
                          "q_unit": q_unit})

    m, n_codes, sub = codebooks.shape

    class PQBatchTopK:
        def __init__(self):
            b = ray.get(bundle_ref)
            self.cb = b["codebooks"]
            self.q_ids = b["q_ids"]
            q = b["q_unit"]
            # ADC lookup table: lut[qi, j, code] = <q_sub_j, code_vec>
            self.lut = np.einsum("qjs,jcs->qjc",
                                 q.reshape(len(q), m, sub), self.cb)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):  # np.stack needs >= 1 array
                return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
            mat = _unit(np.stack(batch[vec_col].to_numpy()))
            ids = batch[id_col].to_numpy()
            x = mat.reshape(len(mat), m, sub)
            d = ((x[:, :, None, :] - self.cb[None, :, :, :]) ** 2).sum(-1)
            codes = d.argmin(axis=2)  # (n, m); first-min = lowest code tie
            j_idx = np.arange(m)
            out_q, out_id, out_sim = [], [], []
            kk = min(k, len(mat))
            for qi in range(len(self.q_ids)):
                scores = self.lut[qi][j_idx, codes].sum(axis=1)
                # full lexsort before truncation (boundary ties keep the
                # lower id — see _BatchTopK)
                sel = np.lexsort((ids, -scores))[:kk]
                out_q.extend([self.q_ids[qi]] * len(sel))
                out_id.extend(ids[sel].tolist())
                out_sim.extend(scores[sel].tolist())
            return pd.DataFrame({"query_id": out_q, "neighbor_id": out_id,
                                 "cosine": out_sim})

    partials = ds.map_batches(PQBatchTopK, batch_format="pandas",
                              batch_size=4096, concurrency=concurrency)
    return _reduce_topk(partials, k)


class HNSWIndex:
    """In-memory HNSW graph (Malkov & Yashunin 2016, public) over a set of
    unit-normalized vectors, maximizing cosine (inner product on units).

    DETERMINISTIC: a point's level comes from the md5 of its id — not an
    RNG — so the graph over a given (id, vector) set is identical across
    runs, processes and partitionings of everything *else* (insertion
    order is pinned by sorting on id before building).

    Pure-python + numpy by design: the container has no compiled ANN lib,
    and the graph walk is pointer-chasing that no Arrow kernel expresses.
    Per-expansion neighbor scoring IS vectorized (one matmul over the
    adjacency list). This class is the per-shard index; distribution
    happens in :func:`hnsw_topk`.
    """

    def __init__(self, mat: np.ndarray, ids: np.ndarray, *, M: int = 8,
                 ef_construction: int = 48):
        import hashlib

        order = np.lexsort((ids,))
        self.mat = _unit(np.asarray(mat, dtype=np.float64))[order]
        self.ids = np.asarray(ids)[order]
        self.M = M
        self.ef_construction = ef_construction
        m_l = 1.0 / np.log(M)
        # md5-derived uniform in (0, 1]: level = floor(-ln(u) * mL)
        lv = []
        for i in self.ids:
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
            u = (h + 1) / float(1 << 52)
            lv.append(int(-np.log(u) * m_l))
        self.levels = lv
        self.graph: list[dict[int, list[int]]] = []  # graph[level][node] -> nbrs
        self.entry = -1
        self.max_level = -1
        for i in range(len(self.ids)):
            self._insert(i)

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      lc: int) -> list[tuple[float, int]]:
        """Best-first beam search on one layer → up to ef (sim, node) pairs."""
        import heapq

        layer = self.graph[lc]
        sims = self.mat[eps] @ q
        visited = set(eps)
        cand = [(-float(s), e) for s, e in zip(sims, eps)]
        heapq.heapify(cand)
        best = [(float(s), e) for s, e in zip(sims, eps)]
        heapq.heapify(best)
        while cand:
            neg_s, c = heapq.heappop(cand)
            if len(best) >= ef and -neg_s < best[0][0]:
                break
            nbrs = [n for n in layer.get(c, ()) if n not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            nsims = self.mat[nbrs] @ q
            for s, n in zip(nsims, nbrs):
                s = float(s)
                if len(best) < ef or s > best[0][0]:
                    heapq.heappush(cand, (-s, n))
                    heapq.heappush(best, (s, n))
                    if len(best) > ef:
                        heapq.heappop(best)
        return best

    def _greedy_descend(self, q: np.ndarray, ep: int, from_level: int,
                        to_level: int) -> int:
        for lc in range(from_level, to_level, -1):
            res = self._search_layer(q, [ep], 1, lc)
            ep = max(res, key=lambda t: (t[0], -t[1]))[1]
        return ep

    def _insert(self, i: int) -> None:
        l = self.levels[i]
        while len(self.graph) <= l:
            self.graph.append({})
        if self.entry < 0:
            for lc in range(l + 1):
                self.graph[lc][i] = []
            self.entry, self.max_level = i, l
            return
        q = self.mat[i]
        ep = self._greedy_descend(q, self.entry, self.max_level, l)
        for lc in range(min(l, self.max_level), -1, -1):
            res = self._search_layer(q, [ep], self.ef_construction, lc)
            res.sort(key=lambda t: (-t[0], t[1]))
            nbrs = [n for _, n in res[: self.M]]
            self.graph[lc][i] = list(nbrs)
            m_max = self.M if lc > 0 else 2 * self.M
            for n in nbrs:
                lst = self.graph[lc][n]
                lst.append(i)
                if len(lst) > m_max:
                    # prune to the m_max closest (sim desc, pos asc — pos
                    # is id order, so the tie rule matches search output)
                    nsims = self.mat[lst] @ self.mat[n]
                    keep = np.lexsort((lst, -nsims))[:m_max]
                    self.graph[lc][n] = [lst[j] for j in keep]
            ep = res[0][1]
        if l > self.max_level:
            # i is the sole occupant of the new top layers — register it
            # there or later descents KeyError on the entry point
            for lc in range(self.max_level + 1, l + 1):
                self.graph[lc][i] = []
            self.entry, self.max_level = i, l

    def search(self, q: np.ndarray, k: int, ef_search: int = 48):
        """Top-k (id, cosine) for one query vector (q need not be unit)."""
        if self.entry < 0:
            return [], []
        q = np.asarray(q, dtype=np.float64)
        n = np.linalg.norm(q)
        if n > 0:
            q = q / n
        ep = self._greedy_descend(q, self.entry, self.max_level, 0)
        res = self._search_layer(q, [ep], max(ef_search, k), 0)
        res.sort(key=lambda t: (-t[0], self.ids[t[1]]))
        res = res[:k]
        return [self.ids[n] for _, n in res], [s for s, _ in res]


def hnsw_topk(ds, query_ids: list, query_vectors: np.ndarray, k: int = 10,
              *, M: int = 8, ef_construction: int = 48, ef_search: int = 48,
              vec_col: str = "embedding", id_col: str = "vec_id",
              concurrency=(1, 4)):
    """Graph-ANN approximate top-k: the sharded-HNSW scale path.

    Each batch (= corpus shard) builds its own deterministic
    :class:`HNSWIndex` and answers every broadcast query with a beam
    search — per-query work is O(ef·log n) graph hops instead of the
    brute path's n-wide matmul, which is what survives when a shard is
    millions of vectors. Shard results are the same bounded partials as
    every other ANN here (≤ k rows per (query, shard)) and reduce through
    the shared per-query combiner, so the exchange never carries vectors.

    This streams shards past a fixed query set (the Dataset contract
    here). The build-once/query-many deployment shape is the same class
    held in actor state: an actor pool keyed by shard builds the graph in
    ``__init__`` and serves query batches from ``__call__`` — the index
    is the per-shard state, never a shared mutable structure.

    Approximate: recall depends on (M, ef); ranking among returned
    candidates is exact cosine (desc, id asc). Not SQL-expressible
    (graph traversal) — quality is gated by recall-vs-brute-force tests
    instead of a DuckDB oracle.
    """
    q_raw = np.asarray(query_vectors, dtype=np.float64)
    bundle_ref = ray.put({"q_ids": list(query_ids), "q_raw": q_raw})

    class ShardHNSW:
        def __init__(self):
            b = ray.get(bundle_ref)  # broadcast: once per actor/worker
            self.q_ids, self.q_raw = b["q_ids"], b["q_raw"]

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):  # np.stack needs >= 1 array
                return pd.DataFrame({"query_id": [], "neighbor_id": [],
                                     "cosine": []})
            mat = np.stack(batch[vec_col].to_numpy())
            ids = batch[id_col].to_numpy()
            index = HNSWIndex(mat, ids, M=M, ef_construction=ef_construction)
            out_q, out_id, out_sim = [], [], []
            for qi, qv in zip(self.q_ids, self.q_raw):
                n_ids, sims = index.search(qv, k, ef_search)
                out_q.extend([qi] * len(n_ids))
                out_id.extend(n_ids)
                out_sim.extend(sims)
            return pd.DataFrame({"query_id": out_q, "neighbor_id": out_id,
                                 "cosine": out_sim})

    partials = ds.map_batches(ShardHNSW, batch_format="pandas",
                              batch_size=4096, concurrency=concurrency)
    return _reduce_topk(partials, k)


def embedding_centroids(ds, *, vec_col: str = "embedding",
                        group_col: str = "label", num_parts: int = 64,
                        nrows: int | None = None):
    """Grouped VECTOR aggregate: the per-group centroid of an embedding
    column (class prototypes / cluster summaries), kept integer-exact so a
    DuckDB oracle replays it bit-for-bit: each component is milli
    fixed-pointed (floor(1000·x) in float64 — the same IEEE ops DuckDB
    performs), summed as int64, and floor-divided by the group count.

    Shape: per-batch vectorized partial (one (group, dim, Σmilli, n) row
    per group×dim per batch — the exchange never carries vectors), then
    the house coarse-partition group-sum keyed on group×dim; the final
    mean is one arithmetic map. Output: (group_col, dim, sum_milli,
    n_vecs, centroid_milli), n_groups × n_dims rows.

    ``nrows``: caller-supplied upper bound on the PARTIAL row count
    (groups × dims × blocks; input_rows × dim is a sound over-bound) for
    the small-input coalesce gate. None ⇒ always the shuffle path — never
    an eager count() here, which would execute the scan twice.
    """
    import pyarrow as pa

    from ..pipelines.relational import coarse_partition_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for g, sub in batch.groupby(group_col, sort=False, dropna=False):
            mat = np.stack(sub[vec_col].to_numpy()).astype(np.float64)
            s = np.floor(1000.0 * mat).astype(np.int64).sum(axis=0)
            d = s.shape[0]
            frames.append(pd.DataFrame({
                group_col: np.repeat(np.asarray([g], dtype=object), d),
                "dim": np.arange(d, dtype=np.int64),
                "sum_milli": s,
                "n_vecs": np.full(d, len(sub), dtype=np.int64)}))
        return pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame({group_col: pd.Series(dtype=object),
                          "dim": pd.Series(dtype="int64"),
                          "sum_milli": pd.Series(dtype="int64"),
                          "n_vecs": pd.Series(dtype="int64")})

    partials = ds.map_batches(partial, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby([group_col, "dim"], as_index=False, dropna=False).agg(
            sum_milli=("sum_milli", "sum"), n_vecs=("n_vecs", "sum"))
        agg["centroid_milli"] = agg["sum_milli"] // agg["n_vecs"]
        for c in ("dim", "sum_milli", "n_vecs", "centroid_milli"):
            agg[c] = agg[c].astype("int64")
        return agg

    def add_key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # string concat key: works for ANY label type (crc32 bucketing
        # downstream), no 2^20-dim or numeric-label collision concerns
        key = pc.binary_join_element_wise(
            pc.cast(batch.column(group_col), pa.string()),
            pc.cast(batch.column("dim"), pa.string()), ":")
        return batch.append_column("gd_key", key)

    keyed = partials.map_batches(add_key, batch_format="pyarrow")
    return coarse_partition_apply(keyed, combine, key_col="gd_key",
                                  part_col="gd_part", num_parts=num_parts,
                                  nrows=nrows)


def _trunc_div(s: np.ndarray, cnt: np.ndarray) -> np.ndarray:
    """Elementwise integer division truncated TOWARD ZERO — DuckDB's ``//``
    semantics (numpy's ``//`` floors, which differs on negatives)."""
    return np.sign(s) * (np.abs(s) // cnt)


def kmeans_assignments(ds, *, vec_col: str = "embedding",
                       id_col: str = "vec_id", k: int = 8, iters: int = 5,
                       scale: int = 1000):
    """Distributed Lloyd's k-means over the FULL embedding table,
    INTEGER-EXACT so an unrolled-CTE DuckDB oracle replays every iteration
    bit-for-bit (the pagerank recipe applied to clustering). Returns
    (id_col, cluster) for every row.

    Fixed-point contract (shared with embedding_centroids): components are
    quantized once as floor(scale·x) in float64 — the same IEEE ops DuckDB
    performs — then ALL distances/sums/means are int64 arithmetic, which
    commutes, so the result is independent of partitioning and merge
    order. Centroid update is trunc-toward-zero division (DuckDB ``//``);
    a cluster that loses all points keeps its previous centroid; distance
    ties resolve to the lowest cluster id (numpy argmin ≡ ORDER BY dist,
    cid). Init: the k smallest-id vectors.

    Scale shape: the slim (id, qvec) projection is materialized ONCE and
    rescanned per iteration (the payload table is read a single time);
    each iteration broadcasts the k×dim centroid matrix via ``ray.put``
    and emits ≤ k·(dim+2)-value partial sums PER BATCH, tree-reduced
    through a bounded repartition — no all-to-all exchange anywhere, and
    assignments are only materialized on the final pass. At 10^12 rows the
    per-iteration exchange is (#blocks × k) tiny rows; everything else is
    embarrassingly parallel."""
    import pyarrow as pa

    from ..pipelines.relational import topk

    def quantize(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "qvec": pd.Series(dtype=object)})
        mat = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        q = np.floor(scale * mat).astype(np.int64)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "qvec": list(q)})

    slim = ds.select_columns([id_col, vec_col]).map_batches(
        quantize, batch_format="pandas").materialize()

    seed = topk(slim, by=[id_col], descending=[False], k=k).to_pandas()
    seed = seed.sort_values(id_col).reset_index(drop=True)
    centroids = np.stack(seed["qvec"].to_numpy()).astype(np.int64)
    dim = centroids.shape[1]

    def assign_ids(qmat: np.ndarray, cents: np.ndarray) -> np.ndarray:
        # (n,k,dim) int64 broadcast diff; argmin's first-min rule IS the
        # lowest-cid tie-break
        d2 = ((qmat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d2.argmin(axis=1)

    sum_cols = [f"s{j}" for j in range(dim)]

    for _ in range(max(0, iters - 1)):
        cents_ref = ray.put(centroids)

        def partial_sums(batch: pd.DataFrame) -> pd.DataFrame:
            cols = {"cluster": pd.Series(dtype="int64"),
                    "cnt": pd.Series(dtype="int64"),
                    **{c: pd.Series(dtype="int64") for c in sum_cols}}
            if not len(batch):
                return pd.DataFrame(cols)
            cents = ray.get(cents_ref)
            qmat = np.stack(batch["qvec"].to_numpy()).astype(np.int64)
            cid = assign_ids(qmat, cents)
            rows = []
            for c in np.unique(cid):
                sub = qmat[cid == c]
                rows.append([int(c), sub.shape[0], *sub.sum(axis=0).tolist()])
            return pd.DataFrame(rows, columns=["cluster", "cnt", *sum_cols])

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df
            return df.groupby("cluster", as_index=False).sum()

        partials = slim.map_batches(partial_sums, batch_format="pandas")
        # ≤ blocks×k tiny rows: under the gate collect them straight to the
        # driver (each repartition is a ~2 s barrier and there are two per
        # iteration × iters); above it, bounded tree reduce. Integer sums
        # commute, so the reduce shape can't change the result.
        if slim.num_blocks() * k <= 100_000:
            sums = combine(partials.to_pandas())
        else:
            sums = (partials.repartition(8)
                    .map_batches(combine, batch_format="pandas",
                                 batch_size=None)
                    .repartition(1)
                    .map_batches(combine, batch_format="pandas",
                                 batch_size=None)
                    .to_pandas())
        new_cents = centroids.copy()
        for _, row in sums.iterrows():
            c = int(row["cluster"])
            s = row[sum_cols].to_numpy().astype(np.int64)
            new_cents[c] = _trunc_div(s, np.int64(row["cnt"]))
        centroids = new_cents

    final_ref = ray.put(centroids)

    def final_assign(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64")})
        cents = ray.get(final_ref)
        qmat = np.stack(batch["qvec"].to_numpy()).astype(np.int64)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "cluster": assign_ids(qmat, cents).astype(np.int64)})

    return slim.map_batches(final_assign, batch_format="pandas")
