"""MediaResolve broadcast join + canonical dump."""

import pyarrow as pa
import pytest


class TestMediaResolve:
    def test_broadcast_lookup(self, ray_session):
        import ray
        import ray.data
        from pdf_parser_ray.stages.media import MediaResolve, synth_media_table

        media = synth_media_table(16)
        ref = ray.put(media)
        rows = [{"doc_id": "d", "media_ref": f"media://synth/{i}"} for i in range(8)]
        rows.append({"doc_id": "d", "media_ref": "media://missing/0"})
        ds = ray.data.from_items(rows)
        out = ds.map_batches(
            MediaResolve, fn_constructor_kwargs={"media_ref_obj": ref},
            batch_format="pyarrow", concurrency=2,
        ).to_pandas()
        assert out["payload"].notna().sum() == 8
        assert out[out["media_ref"] == "media://missing/0"]["payload"].isna().all()
        # payloads equal the sidecar's bytes
        want = media.column("payload").to_pylist()[0]
        got = out[out["media_ref"] == "media://synth/0"]["payload"].iloc[0]
        assert bytes(got) == want


class TestCanonicalDump:
    def test_sorted_by_doc_id(self, ray_session, corpus_sf0001):
        from pdf_parser_ray.pipelines.extraction import canonical_dump, extraction_dataset

        ds = extraction_dataset(corpus_sf0001, parse_concurrency=2)
        out = canonical_dump(ds).to_pandas()
        ids = out["doc_id"].tolist()
        assert ids == sorted(ids) and len(ids) == 10
