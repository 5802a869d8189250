"""MinHash / SimHash / Jaccard sketch kernels."""

import numpy as np

from pdf_parser_ray.functions.minhash import (
    MinHasher,
    SimHasher,
    char_ngrams,
    hamming_distance,
    jaccard,
    minhash_jaccard_estimate,
    shingles,
)


def _doc(words: int, offset: int = 0) -> str:
    return " ".join(f"tok{(i + offset)}" for i in range(words))


class TestMinHash:
    def test_identical_docs_identical_sig(self):
        h = MinHasher()
        a, b = h.signature(_doc(100)), h.signature(_doc(100))
        assert np.array_equal(a, b)

    def test_estimate_tracks_jaccard(self):
        h = MinHasher(num_perm=256)
        d1, d2 = _doc(200), _doc(200, offset=20)  # heavy overlap
        est = minhash_jaccard_estimate(h.signature(d1), h.signature(d2))
        true = jaccard(shingles(d1), shingles(d2))
        assert abs(est - true) < 0.12

    def test_disjoint_low_estimate(self):
        h = MinHasher()
        est = minhash_jaccard_estimate(h.signature(_doc(100)),
                                       h.signature(_doc(100, offset=1000)))
        assert est < 0.1

    def test_band_keys_match_for_identical(self):
        h = MinHasher()
        sig = h.signature(_doc(50))
        assert h.band_keys(sig) == h.band_keys(sig.copy())
        assert len(h.band_keys(sig, num_bands=16)) == 16

    def test_empty_text(self):
        h = MinHasher()
        assert h.signature("").shape == (128,)

    def test_batch_signatures_bit_identical_to_per_doc(self):
        # the batched kernel (one sliding-window combine + chunked
        # reduceat min-fold) must reproduce the per-doc path EXACTLY —
        # cover empty, shorter-than-width, unicode-whitespace, and long
        # docs, plus chunk boundaries straddling docs
        h = MinHasher()
        texts = ["", "one", "two words", "a b c d", _doc(3),
                 "tab\tand nbsp em-space tokens here now",
                 _doc(50), _doc(200), None or "", _doc(7, offset=3),
                 " ", _doc(500), _doc(4, offset=99)]
        per_doc = [h.signature(t) for t in texts]
        for chunk in (1, 7, 4096):
            batch = h.signatures(texts, chunk_shingles=chunk)
            assert all(np.array_equal(x, y)
                       for x, y in zip(per_doc, batch)), chunk

    def test_batch_hashes_match_per_doc(self):
        from pdf_parser_ray.functions.minhash import (
            _word_shingle_hashes, word_shingle_hashes_batch)

        texts = ["", "a", "a b c d e f g", _doc(40), "x y", _doc(3)]
        batch = word_shingle_hashes_batch(texts, 5)
        for t, b in zip(texts, batch):
            assert np.array_equal(_word_shingle_hashes(t, 5), b)


class TestSimHash:
    def test_identical(self):
        h = SimHasher()
        assert h.signature(_doc(80)) == h.signature(_doc(80))

    def test_similar_close_hamming(self):
        h = SimHasher()
        a = h.signature(_doc(200))
        b = h.signature(_doc(200) + " extra")
        assert hamming_distance(a, b) <= 6

    def test_different_far_hamming(self):
        h = SimHasher()
        a = h.signature(_doc(100))
        b = h.signature(_doc(100, offset=5000))
        assert hamming_distance(a, b) > 10


class TestJaccard:
    def test_exact(self):
        assert jaccard({1, 2}, {2, 3}) == 1 / 3
        assert jaccard(set(), set()) == 1.0
        assert jaccard({1}, set()) == 0.0

    def test_char_ngrams(self):
        assert char_ngrams("abcd", 3) == {"abc", "bcd"}
        assert char_ngrams("ab", 3) == {"ab"}
        assert char_ngrams("", 3) == set()


class TestPermMinP61:
    """The vectorized exact mod-(2^61-1) permutation kernel must be
    bit-identical to python-int bigint arithmetic — the DuckDB HUGEINT
    oracle replays that arithmetic literally."""

    def _ref(self, hs, a, b):
        p = (1 << 61) - 1
        return [min(((ai * h + bi) % p) & 0xFFFFFFFF for h in hs.tolist())
                for ai, bi in zip(a.tolist(), b.tolist())]

    def test_edge_values(self):
        from pdf_parser_ray.functions.minhash import _perm_min_p61

        p = (1 << 61) - 1
        hs = np.array([0, 1, p - 1, p, 2**31 - 1, 2**31, 2**60, 2**61 - 2],
                      dtype=np.uint64)
        a = np.array([1, p - 1, 2**31, 2**60 + 12345, 7], dtype=np.uint64)
        b = np.array([0, p - 1, 2**31 - 1, 2**60, 13], dtype=np.uint64)
        assert _perm_min_p61(hs, a, b).tolist() == self._ref(hs, a, b)

    def test_random_values(self):
        from pdf_parser_ray.functions.minhash import _perm_min_p61

        p = (1 << 61) - 1
        rng = np.random.default_rng(123)
        hs = rng.integers(0, p, 300, dtype=np.uint64)
        a = rng.integers(1, p, 64, dtype=np.uint64)
        b = rng.integers(0, p, 64, dtype=np.uint64)
        assert _perm_min_p61(hs, a, b).tolist() == self._ref(hs, a, b)

    def test_signature_matches_python_reference(self):
        """End-to-end: minhash_signature_md5 == the pre-vectorization
        python-int implementation on real texts."""
        import hashlib

        from pdf_parser_ray.functions.minhash import (
            _P61, _hash_family, minhash_signature_md5, shingles_ascii)

        def ref_sig(text, num_perm=32, width=5, seed=42):
            sh = shingles_ascii(text, width)
            if not sh:
                return [0xFFFFFFFF] * num_perm
            a, b = _hash_family(num_perm, seed)
            hs = [int(hashlib.md5(s.encode()).hexdigest()[:16], 16) & _P61
                  for s in sh]
            return [min(((ai * h + bi) % _P61) & 0xFFFFFFFF for h in hs)
                    for ai, bi in zip(a.tolist(), b.tolist())]

        texts = ["", "one", "one two three four five six",
                 " ".join(f"w{i % 37}" for i in range(250))]
        for t in texts:
            assert minhash_signature_md5(t) == ref_sig(t)

    def test_chunked_equals_one_shot(self):
        """The memory-bounding shingle-axis chunking must not change any
        value (running min across slices == global min)."""
        from pdf_parser_ray.functions.minhash import _perm_min_p61

        p = (1 << 61) - 1
        rng = np.random.default_rng(5)
        hs = rng.integers(0, p, 1000, dtype=np.uint64)
        a = rng.integers(1, p, 16, dtype=np.uint64)
        b = rng.integers(0, p, 16, dtype=np.uint64)
        full = _perm_min_p61(hs, a, b)
        assert (_perm_min_p61(hs, a, b, _chunk=7) == full).all()
        assert (_perm_min_p61(hs, a, b, _chunk=999) == full).all()

    def test_simhash_batch_identical_to_per_doc(self):
        from pdf_parser_ray.functions.minhash import SimHasher

        h = SimHasher()
        texts = ["", "one", "a b c", _doc(40), " \t ", _doc(7, offset=9),
                 "Tab\tmixed CASE case", _doc(300), None or ""]
        assert h.signatures(texts) == [h.signature(t) for t in texts]
