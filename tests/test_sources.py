"""Fetch/sink layer (SURVEY.md §2.1 S3/S4/S6/S21): throttle math,
distributed fetch plumbing with injected clients, artifact sinks,
and the binaryFile scan path."""

from __future__ import annotations

import pytest

from damg7245_casestudy_03_ai_scoring_engine_spark.operators.ingest import pdf_text_extract_udf
from damg7245_casestudy_03_ai_scoring_engine_spark.sources.fetch import (
    RateLimitedFetcher,
    fetch_urls,
    http_fetch,
    write_artifacts,
)


def test_rate_limiter_spacing():
    t = {"now": 0.0}
    slept = []

    def clock():
        return t["now"]

    def sleep(s):
        slept.append(s)
        t["now"] += s

    f = RateLimitedFetcher(
        fetch_fn=lambda u: b"x", max_per_sec=5.0, clock=clock, sleep=sleep
    )
    for _ in range(6):
        f.fetch("http://u")
    # first call free; each subsequent call spaced 0.2 s
    assert f.requests_made == 6
    assert sum(slept) == pytest.approx(1.0)
    assert all(s == pytest.approx(0.2) for s in slept)


def test_http_fetch_is_stubbed():
    with pytest.raises(NotImplementedError):
        http_fetch("https://example.com")


def test_pdf_extract_is_gated():
    with pytest.raises(NotImplementedError):
        pdf_text_extract_udf()


def test_fetch_urls_distributed(spark):
    urls = spark.createDataFrame(
        [("doc://a",), ("doc://b",), ("err://c",)], "url string"
    )

    def fake_fetch(url: str) -> bytes:
        if url.startswith("err"):
            raise IOError("boom")
        return url.encode()[::-1]

    rows = {r.url: r for r in fetch_urls(urls, fetch_fn=fake_fetch).collect()}
    assert rows["doc://a"].content == b"doc://a"[::-1]
    assert rows["doc://a"].error is None
    assert rows["err://c"].content is None
    assert "boom" in rows["err://c"].error


def test_write_artifacts_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    p_json = str(tmp_path / "artifacts_json")
    write_artifacts(df, p_json, "json")
    assert sorted(tuple(r) for r in spark.read.json(p_json).select("id", "v").collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    p_text = str(tmp_path / "artifacts_text")
    write_artifacts(df.select(df.v.alias("value")), p_text, "text")
    assert sorted(r.value for r in spark.read.text(p_text).collect()) == ["a", "b"]
    with pytest.raises(ValueError):
        write_artifacts(df, str(tmp_path / "x"), "csvish")


def test_binary_file_scan(spark, tmp_path):
    # S4's read-back path: raw filing bytes on disk → binaryFile scan
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "f1.htm").write_bytes(b"<html>alpha</html>")
    (raw / "f2.htm").write_bytes(b"<html>beta</html>")
    df = spark.read.format("binaryFile").load(str(raw))
    got = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in df.collect()}
    assert got == {"f1.htm": b"<html>alpha</html>", "f2.htm": b"<html>beta</html>"}


def test_resize_images_fake_kernel(spark):
    from damg7245_casestudy_03_ai_scoring_engine_spark.operators.multimodal import (
        documents_as_assets,
        fake_decode,
        resize_images,
    )
    from conftest import SF_SMOKE

    assets = documents_as_assets(spark, SF_SMOKE)
    resized = {r.asset_id: r for r in resize_images(assets, max_side=64).collect()}
    for r in assets.collect():
        out = resized[r.asset_id]
        if r.kind == "image":
            assert out.width is not None and max(out.width, out.height) <= 64
            assert len(out.content) <= len(r.content)
            d = fake_decode(bytes(r.content), "image")
            if max(d["width"], d["height"]) <= 64:  # no upscale
                assert (out.width, out.height) == (d["width"], d["height"])
        else:
            assert out.width is None and bytes(out.content) == bytes(r.content)


def test_sample_frames_every_nth(spark):
    from damg7245_casestudy_03_ai_scoring_engine_spark.operators.multimodal import (
        documents_as_assets,
        fake_decode,
        sample_frames,
    )
    from conftest import SF_SMOKE

    assets = documents_as_assets(spark, SF_SMOKE)
    frames = sample_frames(assets, every_nth=4).collect()
    assert frames, "expected sampled frames"
    assert all(f.frame_index % 4 == 0 for f in frames)
    vids = {r.asset_id: bytes(r.content) for r in assets.collect() if r.kind == "video"}
    by_asset: dict[int, list] = {}
    for f in frames:
        by_asset.setdefault(f.asset_id, []).append(f.frame_index)
    for aid, idxs in by_asset.items():
        n = fake_decode(vids[aid], "video")["n_frames"]
        assert sorted(idxs) == list(range(0, n, 4))
