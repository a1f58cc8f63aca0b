"""Multimodal plumbing: binary payload columns, metadata typing,
stubbed decode — schema/batch-shape/determinism tests."""

from __future__ import annotations

import pytest

from isidorus_web_scraper_spark.operators.multimodal import (
    decode_features,
    fake_payload,
    media_table,
)


@pytest.fixture(scope="module")
def refs(spark):
    return spark.createDataFrame(
        [
            ("http://img0.test/a.png",),
            ("http://img0.test/b.jpg?size=big",),
            ("http://aud.test/x.mp3",),
            ("http://vid.test/v.mp4",),
            ("http://weird.test/noext",),
        ],
        "media_ref string",
    )


def test_media_table_schema_and_types(spark, refs):
    media = media_table(refs)
    rows = {r.media_ref: r for r in media.collect()}
    assert media.schema["payload"].dataType.typeName() == "binary"
    a = rows["http://img0.test/a.png"]
    assert (a.kind, a.ext, a.content_type) == ("image", "png", "image/png")
    assert a.n_bytes == len(a.payload) == 256
    # query string stripped by ext inference (extractor_service.go:117-129)
    assert rows["http://img0.test/b.jpg?size=big"].ext == "jpg"
    assert rows["http://aud.test/x.mp3"].kind == "audio"
    assert rows["http://vid.test/v.mp4"].kind == "video"
    assert rows["http://weird.test/noext"].ext == "bin"


def test_payload_deterministic(spark, refs):
    m1 = {r.media_ref: bytes(r.payload) for r in media_table(refs).collect()}
    m2 = {r.media_ref: bytes(r.payload) for r in media_table(refs).collect()}
    assert m1 == m2
    assert m1["http://img0.test/a.png"] == fake_payload("http://img0.test/a.png")


def test_decode_features_fake(spark, refs):
    media = media_table(refs)
    feats = {r.media_ref: r for r in decode_features(media).collect()}
    img = feats["http://img0.test/a.png"]
    assert len(img.features) == 8
    assert all(0.0 <= f <= 1.0 for f in img.features)
    assert img.width is not None and img.height is not None
    assert feats["http://vid.test/v.mp4"].n_frames == 4
    assert feats["http://aud.test/x.mp3"].width is None


def test_decode_real_is_stubbed(spark, refs):
    with pytest.raises(NotImplementedError):
        decode_features(media_table(refs), mode="real")


def test_data_url(spark, refs):
    from isidorus_web_scraper_spark.operators.multimodal import data_url_col

    media = media_table(refs)
    row = (
        media.filter("ext = 'png'")
        .select(data_url_col("payload", "content_type").alias("durl"))
        .first()
    )
    assert row.durl.startswith("data:image/png;base64,")


def test_media_store_written_by_crawl(spark, tmp_path):
    from isidorus_web_scraper_spark.corpus import golden_documents
    from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh"),
        documents=golden_documents(spark),
        config=CrawlConfig(
            bloom_expected_urls=1024,
            default_budget=10**9,
            media_store_enabled=True,
        ),
    )
    eng.start([(1, 10, "http://mock-website:8000/index.html", 2)])
    eng.run()
    media = eng.wh.read("media_store").collect()
    assert len(media) == 1
    m = media[0]
    assert m.media_ref == "http://mock-website:8000/darth.png"
    assert m.s3_path.startswith("1/") and m.s3_path.endswith(".png")
    assert m.content_type == "image/png" and len(m.payload) == 256
