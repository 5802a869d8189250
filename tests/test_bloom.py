"""Bloom filter semi-join kernel."""

import numpy as np
import pytest

from pdf_parser_ray.functions.bloom import BloomFilter, build_bloom_from_dataset


class TestBloom:
    def test_no_false_negatives(self):
        bf = BloomFilter(capacity=1000, fp_rate=0.01)
        keys = [f"key-{i}" for i in range(1000)]
        bf.add_many(keys)
        assert all(bf.might_contain(k) for k in keys)

    def test_fp_rate_in_range(self):
        bf = BloomFilter(capacity=2000, fp_rate=0.01)
        bf.add_many(f"member-{i}" for i in range(2000))
        fps = sum(bf.might_contain(f"other-{i}") for i in range(5000))
        assert fps / 5000 < 0.05  # ~1% target, loose bound

    def test_deterministic(self):
        a, b = BloomFilter(100), BloomFilter(100)
        for f in (a, b):
            f.add_many(["x", "y", "z"])
        assert np.array_equal(a.bits, b.bits)

    def test_size_scales_with_capacity(self):
        small, big = BloomFilter(1000), BloomFilter(100_000)
        assert big.nbytes > small.nbytes
        assert big.nbytes < 100_000 * 2  # ~10 bits/key → < 2 B/key

    def test_semi_join_under_ray(self, ray_session):
        import ray
        import ray.data
        import pandas as pd

        build = ray.data.from_items([{"k": f"k{i}"} for i in range(0, 100, 2)])
        bf = build_bloom_from_dataset(build, "k")
        bf_ref = ray.put(bf)

        class SemiFilter:
            def __init__(self):
                self.bf = ray.get(bf_ref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                return batch[self.bf.contains_many(batch["k"])]

        probe = ray.data.from_items([{"k": f"k{i}", "v": i} for i in range(100)])
        out = probe.map_batches(SemiFilter, batch_format="pandas",
                                concurrency=2).to_pandas()
        got = set(out["k"])
        want = {f"k{i}" for i in range(0, 100, 2)}
        assert want <= got  # no false negatives
        assert len(got - want) <= 5  # few FPs


class TestNumericPath:
    def test_int_keys_no_false_negatives_across_collection_types(self):
        from pdf_parser_ray.functions.bloom import BloomFilter
        import numpy as np

        rng = np.random.default_rng(5)
        keys = rng.integers(0, 2**63, size=3000, dtype=np.uint64)
        bf = BloomFilter(capacity=3000)
        bf.add_many(keys)                               # np array build
        # probe as np array, python-int list, and scalars — all must hit
        assert bf.contains_many(keys).all()
        assert bf.contains_many([int(k) for k in keys[:200]]).all()
        assert all(bf.might_contain(int(k)) for k in keys[:50])
        # and a list-built filter must agree with an array-built probe
        bf2 = BloomFilter(capacity=3000)
        bf2.add_many([int(k) for k in keys])
        assert bf2.contains_many(keys).all()

    def test_int_fp_rate_reasonable(self):
        from pdf_parser_ray.functions.bloom import BloomFilter
        import numpy as np

        bf = BloomFilter(capacity=5000, fp_rate=0.01)
        bf.add_many(np.arange(5000, dtype=np.uint64))
        probes = np.arange(10_000_000, 10_050_000, dtype=np.uint64)
        fp = bf.contains_many(probes).sum() / len(probes)
        assert fp < 0.03

    def test_empty_and_string_fallback(self):
        from pdf_parser_ray.functions.bloom import BloomFilter
        import numpy as np

        bf = BloomFilter(capacity=10)
        bf.add_many(["a", "b"])
        assert bf.contains_many(np.zeros(0, dtype=np.uint64)).shape == (0,)
        assert bf.contains_many(["a", "b"]).all()
        assert not bf.might_contain("zz")
