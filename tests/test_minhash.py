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
