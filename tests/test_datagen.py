"""Datagen determinism + invariant tests (no Spark)."""

import os

import numpy as np

from crawlspark import codecs, datagen
from crawlspark.functions.urls import canonicalize_url, hash64

SPEC = datagen.GenSpec(seed=42, n_images=40, n_urls=300, n_hosts=12, n_strata=4)


def test_image_caption_shape_and_determinism():
    df1 = datagen.gen_image_caption(SPEC)
    df2 = datagen.gen_image_caption(SPEC)
    assert list(df1.columns) == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    ]
    assert df1.equals(df2)
    assert set(df1["fmt"]).issubset(set(codecs.FORMATS))


def test_image_caption_row_invariant():
    df = datagen.gen_image_caption(SPEC)
    for row in df.itertuples():
        dec = codecs.decode_image(row.bytes, row.fmt, row.w, row.h)
        ref = codecs.make_pixels(row.image_id, row.w, row.h)
        if codecs.is_lossless(row.fmt):
            assert np.array_equal(dec, ref)
        else:
            assert codecs.psnr_db(ref, dec) >= 40.0
        assert codecs.phash64(dec) == row.phash
        assert codecs.make_caption(row.image_id) == row.caption


def test_frontier_shape():
    f = datagen.gen_frontier(SPEC)
    assert len(f) == SPEC.n_urls
    # hash matches canonicalized url
    sample = f.head(50)
    for row in sample.itertuples():
        assert hash64(canonicalize_url(row.url)) == row.url_hash
    # duplicates exist (first-seen dedup is exercised)
    assert f["url_hash"].nunique() < len(f)
    # skew exists: top host should dominate
    counts = f["host"].value_counts()
    assert counts.iloc[0] > counts.iloc[-1] * 3
    # every image_id resolves
    assert f["image_id"].str.match(r"img_\d{12}").all()
    # some robots-blocked paths
    assert f["url"].str.contains("/private/").any()


def test_budgets_and_robots():
    b = datagen.gen_budgets(SPEC)
    assert (b["tokens"] == b["capacity"]).all()
    assert (b["refill_per_epoch"] >= 1).all()
    r = datagen.gen_robots(SPEC)
    assert len(r) == SPEC.n_hosts
    assert r["disallow_prefixes"].map(lambda p: "/private/" in p).all()


def test_staged_fixtures_deterministic(tmp_path):
    """The committed fixtures/*.parquet equal a fresh regeneration row for
    row — the DuckDB oracle reads the committed file while Spark recomputes
    from bytes, so the two must never drift."""
    import pandas as pd

    for ensure, committed in [
        (datagen.ensure_image_fixture, datagen.IMAGE_FIXTURE_PATH),
        (datagen.ensure_audio_fixture, datagen.AUDIO_FIXTURE_PATH),
        (datagen.ensure_video_fixture, datagen.VIDEO_FIXTURE_PATH),
    ]:
        fresh_path = str(tmp_path / os.path.basename(committed))
        ensure(fresh_path)
        a = pd.read_parquet(committed)
        b = pd.read_parquet(fresh_path)
        pd.testing.assert_frame_equal(a, b)
