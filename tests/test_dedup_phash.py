"""Perceptual-hash near-dup image dedup (dedup_phash) + the near-dup
variant generator feeding it.

The operator's recall claim is structural — 8 disjoint 8-bit bands over a
64-bit phash pigeonhole-guarantee that any pair with hamming <= 7 shares a
byte-identical band, so at the verify threshold (5) the band join finds
EXACTLY the pairs an all-pairs scan would. These tests check that claim
against a brute-force numpy oracle on the real fixture, that the fixture
actually contains planted near-dups (an empty-result pass would certify
nothing), and that the datagen variants keep every per-row crawl invariant
(phash recompute, caption, PSNR vs the variant's own source pixels).
"""

from __future__ import annotations

import numpy as np

from crawlspark import codecs, datagen
from crawlspark.textops import _PHASH_THRESHOLD, dedup_phash


def _brute_pairs(ids, phashes, thresh):
    out = []
    p = np.asarray(phashes, dtype=np.int64).view(np.uint64)
    for i in range(len(ids)):
        x = p[i] ^ p[i + 1:]
        for j, v in enumerate(x, start=i + 1):
            if bin(int(v)).count("1") <= thresh:
                a, b = sorted((ids[i], ids[j]))
                out.append((a, b))
    return sorted(out)


def test_dedup_phash_matches_bruteforce(spark):
    import pandas as pd

    fixture = datagen.ensure_image_fixture()
    pdf = pd.read_parquet(fixture, columns=["image_id", "phash"])
    expected = _brute_pairs(list(pdf["image_id"]), list(pdf["phash"]),
                            _PHASH_THRESHOLD)
    got = [(r["id_a"], r["id_b"])
           for r in dedup_phash(spark, "unused").collect()]
    assert got == expected
    # the fixture plants ~64 near-dup variants; finding nothing would make
    # this test (and the driver row) vacuous
    assert len(got) >= 32


def test_dedup_phash_hamming_values(spark):
    rows = dedup_phash(spark, "unused").collect()
    assert all(0 <= r["hamming"] <= _PHASH_THRESHOLD for r in rows)
    # pairs are unique and id-ordered
    seen = set()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert (r["id_a"], r["id_b"]) not in seen
        seen.add((r["id_a"], r["id_b"]))


def test_variant_rows_keep_crawl_invariants():
    """Variant rows are REAL images: phash == phash64(decode(bytes)),
    caption intact, lossy decode within PSNR 40 of the variant's own
    (perturbed) source pixels — the same invariant independent rows carry,
    reconstructed via datagen.variant_pixels / variant_base_index."""
    spec = datagen.GenSpec(seed=11, n_images=48, n_urls=48, n_hosts=4,
                           img_sizes=(16, 32), near_dup_rate=0.25)
    df = datagen.gen_image_caption(spec)
    n_variants = sum(
        1 for i in range(spec.n_images)
        if datagen.variant_base_index(spec, i) is not None)
    assert n_variants == 12
    base_px = {}
    for i, row in enumerate(df.itertuples()):
        b = datagen.variant_base_index(spec, i)
        if b is None:
            src = codecs.make_pixels(row.image_id, row.w, row.h)
            base_px[i] = src
        else:
            base = df.iloc[b]
            assert (row.w, row.h, row.fmt) == \
                (base["w"], base["h"], base["fmt"])
            src = datagen.variant_pixels(base_px[b], row.image_id)
        dec = codecs.decode_image(row.bytes, row.fmt, row.w, row.h)
        if codecs.is_lossless(row.fmt):
            assert np.array_equal(dec, src)
        else:
            assert codecs.psnr_db(src, dec) >= 40.0
        assert codecs.phash64(dec) == row.phash
        assert codecs.make_caption(row.image_id) == row.caption


def test_fixture_variants_within_threshold():
    """Planted fixture variants land within the verify threshold of their
    base (the tuned perturbation), and no two INDEPENDENT base images
    collide under it — separation is what makes threshold 5 meaningful."""
    import pandas as pd

    spec = datagen.IMAGE_FIXTURE_SPEC
    pdf = pd.read_parquet(datagen.ensure_image_fixture(),
                          columns=["image_id", "phash"])
    p = pdf["phash"].to_numpy().view(np.uint64)

    def ham(i, j):
        return bin(int(p[i] ^ p[j])).count("1")

    variant_of = {i: datagen.variant_base_index(spec, i)
                  for i in range(spec.n_images)}
    variants = {i: b for i, b in variant_of.items() if b is not None}
    assert len(variants) == 64
    for i, b in variants.items():
        assert ham(i, b) <= _PHASH_THRESHOLD
    base_ids = [i for i, b in variant_of.items() if b is None]
    rng = np.random.RandomState(3)
    for _ in range(2000):
        i, j = rng.choice(base_ids, 2, replace=False)
        assert ham(int(i), int(j)) > _PHASH_THRESHOLD
