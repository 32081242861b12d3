"""Multimodal plumbing: binary payload column through mapInPandas,
deterministic stub decode, decoder registry override, null payloads."""

from __future__ import annotations

from pyspark.sql import functions as F


def _media_df(spark):
    rows = [
        ("d1", "img://a/1", "image", b"\x89PNG fake"),
        ("d1", "img://a/2", "image", b""),
        ("d2", "vid://b/1", "video", None),
    ]
    return spark.createDataFrame(
        rows, "doc_id string, media_ref string, media_kind string, payload binary"
    )


def test_media_features_schema_and_determinism(spark):
    from pdf_extract_spark.operators.multimodal import (
        media_features, polyhash_bytes,
    )

    out = {r.media_ref: r for r in media_features(_media_df(spark)).collect()}
    assert len(out) == 3
    r = out["img://a/1"]
    assert r.n_bytes == 9
    assert r.phash == polyhash_bytes(b"\x89PNG fake")
    assert r.decoder == "stub:image"
    assert 64 <= r.width < 64 + 1856 and 64 <= r.height < 64 + 1016
    # empty and null payloads both decode (n_bytes 0, phash 0)
    assert out["img://a/2"].n_bytes == 0 and out["img://a/2"].phash == 0
    assert out["vid://b/1"].n_bytes == 0
    assert out["vid://b/1"].decoder == "stub:video"
    # deterministic across runs and partitionings
    again = {
        r.media_ref: r
        for r in media_features(_media_df(spark).repartition(3)).collect()
    }
    assert {k: (v.width, v.height, v.phash) for k, v in out.items()} == {
        k: (v.width, v.height, v.phash) for k, v in again.items()
    }


def test_register_decoder_override(spark):
    from pdf_extract_spark.operators import multimodal

    def fake_image(payload, ref, kind):
        return {"n_bytes": len(payload), "width": 1, "height": 2,
                "phash": 3, "decoder": "pil"}

    multimodal.register_decoder("image", fake_image)
    try:
        out = {r.media_ref: r
               for r in multimodal.media_features(_media_df(spark)).collect()}
        assert out["img://a/1"].decoder == "pil"
        assert out["img://a/1"].width == 1
        assert out["vid://b/1"].decoder == "stub:video"  # untouched kind
    finally:
        multimodal._DECODERS.pop("image", None)


def test_media_from_documents_shape(spark):
    from pdf_extract_spark.operators.multimodal import media_from_documents

    m = media_from_documents(spark, "/root/testdata/sf0.001")
    assert m.columns == ["doc_id", "media_ref", "media_kind", "payload"]
    row = m.orderBy("doc_id").first()
    assert row.media_ref.startswith("img://")
    assert isinstance(row.payload, (bytes, bytearray))


def test_image_resize_bounds_and_aspect(spark):
    from pdf_extract_spark.operators.multimodal import (
        RESIZE_MAX_DIM,
        image_resize,
        media_from_documents,
    )

    rows = image_resize(
        media_from_documents(spark, "/root/testdata/sf0.001").limit(40)
    ).collect()
    assert rows
    for r in rows:
        assert max(r["out_width"], r["out_height"]) <= max(
            RESIZE_MAX_DIM, min(r["width"], r["height"]))
        assert r["out_width"] >= 1 and r["out_height"] >= 1
        if max(r["width"], r["height"]) <= RESIZE_MAX_DIM:
            assert (r["out_width"], r["out_height"]) == (r["width"], r["height"])
        else:
            # aspect preserved within integer rounding
            lhs = r["out_width"] * r["height"]
            rhs = r["out_height"] * r["width"]
            assert abs(lhs - rhs) <= max(r["width"], r["height"])


def test_video_frame_sample_fanout(spark):
    from pdf_extract_spark.operators.multimodal import (
        FRAME_MAX,
        media_from_documents,
        video_frame_sample,
    )

    media = media_from_documents(spark, "/root/testdata/sf0.001").limit(25)
    frames = video_frame_sample(media).collect()
    per_ref = {}
    for f in frames:
        per_ref.setdefault(f["media_ref"], []).append(f)
    assert len(per_ref) == 25
    for ref, fs in per_ref.items():
        assert 1 <= len(fs) <= FRAME_MAX
        idxs = sorted(f["frame_idx"] for f in fs)
        assert idxs == list(range(len(fs)))  # dense, 0-based
        assert all(f["frame_ref"] == f"{ref}#f{f['frame_idx']}" for f in fs)
