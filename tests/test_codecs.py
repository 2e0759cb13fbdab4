"""Codec / phash / canonicalization unit tests (no Spark)."""

import numpy as np
import pytest

from crawlspark import codecs
from crawlspark.functions.urls import canonicalize_url, hash64, url_hash64


@pytest.mark.parametrize("w,h", [(16, 16), (32, 16), (64, 32), (64, 64)])
def test_raw_rle_lossless(w, h):
    px = codecs.make_pixels(f"img_{w}x{h}", w, h)
    for fmt in ("raw", "rle"):
        buf = codecs.encode_image(px, fmt)
        out = codecs.decode_image(buf, fmt, w, h)
        assert np.array_equal(px, out), fmt


@pytest.mark.parametrize("w,h", [(16, 16), (32, 32), (64, 32), (64, 64)])
def test_qdct_psnr_above_40(w, h):
    px = codecs.make_pixels(f"img_q_{w}x{h}", w, h)
    buf = codecs.encode_image(px, "qdct")
    out = codecs.decode_image(buf, "qdct", w, h)
    p = codecs.psnr_db(px, out)
    assert p >= 40.0, p
    assert not np.array_equal(px, out)  # genuinely lossy


def test_pixels_and_caption_deterministic():
    a = codecs.make_pixels("img_000000000007", 32, 32)
    b = codecs.make_pixels("img_000000000007", 32, 32)
    assert np.array_equal(a, b)
    assert codecs.make_caption("img_000000000007") == codecs.make_caption(
        "img_000000000007"
    )
    assert codecs.make_caption("img_000000000007").startswith("a ")


def test_phash_deterministic_and_int64():
    px = codecs.make_pixels("img_000000000001", 64, 32)
    h1 = codecs.phash64(px)
    h2 = codecs.phash64(px.copy())
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)
    other = codecs.phash64(codecs.make_pixels("img_000000000002", 64, 32))
    assert h1 != other


def test_phash_stable_under_qdct():
    # phash stored at datagen time is computed on the DECODED payload, so the
    # recompute in the validation UDF matches bit-exactly.
    px = codecs.make_pixels("img_000000000042", 32, 32)
    dec = codecs.decode_image(codecs.encode_image(px, "qdct"), "qdct", 32, 32)
    assert codecs.phash64(dec) == codecs.phash64(dec.copy())


def test_canonicalize_url():
    assert canonicalize_url("http://HOST0001.example.com:80/img/x#frag") == (
        "http://host0001.example.com/img/x"
    )
    assert canonicalize_url("https://h.com:443/a/../b/./c") == "https://h.com/b/c"
    assert canonicalize_url("http://h.com") == "http://h.com/"
    assert canonicalize_url("http://h.com/p?b=2&a=1") == "http://h.com/p?a=1&b=2"
    assert canonicalize_url("http://h.com:8080/x") == "http://h.com:8080/x"
    # twins collapse to the same hash
    assert url_hash64("http://A.com/img/../img/./z#f") == url_hash64(
        "http://a.com/img/z"
    )


def test_hash64_range():
    h = hash64("http://a.com/")
    assert 0 <= h < (1 << 60)
