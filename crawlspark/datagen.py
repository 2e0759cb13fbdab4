"""Deterministic synthetic crawl-domain data generator (FIXTURES.md §A/§B).

Single integer seed; numpy RandomState only (no wall clock, no global RNG) so
the Spark engine and the pure-Python oracle see byte-identical inputs
(SURVEY.md §5). Writes plain pandas DataFrames; callers persist via pyarrow
or ``spark.createDataFrame``.

Shapes mirror the reference's crawl space:
  * frontier strata/priority  <- ordered GitHub search-query list
    (/root/reference/src/infrastructure/github_api.py:221-462)
  * per-host skew             <- broad strata dominating the crawl
    (github_api.py:460); hosts drawn Zipf(s~=1.1)
  * injected duplicates       <- cross-page duplicate repos handled by the
    seen-set (github_api.py:548-555); ~10% dup rate + canonicalization twins
  * politeness budgets        <- rate-limit state
    (/root/reference/src/domain/entities.py:178-194)
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

from . import codecs
from .functions.urls import canonicalize_url, hash64, host_of

BASE_EPOCH_TS = pd.Timestamp("2026-01-01T00:00:00Z")


@dataclass(frozen=True)
class GenSpec:
    seed: int = 42
    n_images: int = 1000
    n_urls: int = 5000
    n_hosts: int = 50
    n_strata: int = 8
    zipf_s: float = 1.1
    dup_rate: float = 0.10
    dirty_rate: float = 0.05      # canonicalization twins
    robots_block_rate: float = 0.05
    # image dims drawn from this set; must be multiples of 8 (qdct blocks)
    # and even (half-res downsample)
    img_sizes: tuple = (16, 32, 64)
    # fraction of images that are NEAR-DUPLICATE variants of an earlier
    # base image (lightly perturbed pixels, re-encoded): the input
    # dedup_phash exists to find. 0.0 = every image independent (the
    # pre-round-4 behavior; all non-fixture specs keep it).
    near_dup_rate: float = 0.0


def _host_name(i: int) -> str:
    return f"host{i:04d}.example.com"


def variant_pixels(base_px: np.ndarray, variant_id: str) -> np.ndarray:
    """Deterministic near-duplicate perturbation: +-1 on ~3% of channel
    values, keyed by the VARIANT's id so regeneration is reproducible and
    tests can reconstruct any variant from (base pixels, variant id). Small
    enough that the 64-bit phash of the perturbed image stays within a few
    bits of the base's (measured 0-4; dedup_phash's verify threshold is 5,
    comfortably under the 8-band pigeonhole guarantee of 7)."""
    rng = np.random.RandomState(hash64(variant_id) & 0x7FFFFFFF)
    noise = rng.randint(-3, 4, base_px.shape).astype(np.int16)
    mask = rng.rand(*base_px.shape) < 0.15
    return np.clip(base_px.astype(np.int16) + noise * mask, 0, 255) \
             .astype(np.uint8)


def variant_base_index(spec: GenSpec, i: int) -> int | None:
    """Which earlier image index row ``i`` is a near-dup variant of, or
    None for independent rows. Pure function of (spec, i): the last
    ``round(n*near_dup_rate)`` rows are variants, each of a base drawn from
    a RandomState seeded off the spec seed — the same rule
    :func:`gen_image_caption` applies."""
    n_variants = int(round(spec.n_images * spec.near_dup_rate))
    n_base = spec.n_images - n_variants
    if i < n_base:
        return None
    vrng = np.random.RandomState(spec.seed + 1_000_003)
    bases = vrng.randint(0, n_base, size=n_variants)
    return int(bases[i - n_base])


def gen_image_caption(spec: GenSpec) -> pd.DataFrame:
    """Primary input table — exact input_hint shape:
    (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64). ``phash`` is computed over the *decoded*
    payload so the recompute invariant holds exactly even for lossy qdct.

    With ``spec.near_dup_rate > 0`` the tail rows are near-duplicate
    variants of earlier base images (same dims/fmt, pixels perturbed by
    :func:`variant_pixels`) — real re-hosted-image copies for dedup_phash
    to find; every per-row invariant (phash == phash64(decoded), caption,
    PSNR for lossy fmts vs the variant's own source pixels) still holds."""
    rng = np.random.RandomState(spec.seed)
    sizes = np.array(spec.img_sizes, dtype=np.int32)
    rows = []
    base_px_cache: list[np.ndarray] = []
    for i in range(spec.n_images):
        image_id = f"img_{i:012d}"
        base = variant_base_index(spec, i)
        if base is None:
            w = int(sizes[rng.randint(len(sizes))])
            h = int(sizes[rng.randint(len(sizes))])
            fmt = codecs.FORMATS[rng.randint(len(codecs.FORMATS))]
            px = codecs.make_pixels(image_id, w, h)
            base_px_cache.append(px)
        else:
            b = rows[base]
            w, h, fmt = b["w"], b["h"], b["fmt"]
            px = variant_pixels(base_px_cache[base], image_id)
        buf = codecs.encode_image(px, fmt)
        decoded = codecs.decode_image(buf, fmt, w, h)
        rows.append(
            {
                "image_id": image_id,
                "bytes": buf,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": codecs.make_caption(image_id),
                "phash": codecs.phash64(decoded),
            }
        )
    df = pd.DataFrame(rows)
    df["w"] = df["w"].astype(np.int32)
    df["h"] = df["h"].astype(np.int32)
    df["phash"] = df["phash"].astype(np.int64)
    return df


# The 512-row multimodal fixture (textops.multimodal_pipeline): generated
# once, staged as parquet so the Spark side reads it distributed and the
# DuckDB oracle reads the same file. Expected decode-derived columns
# (mean luminance before/after resize) are precomputed here with the exact
# arithmetic the mapInPandas UDFs apply, so the driver's value-hash compare
# checks the decode path end to end. Scaled 64 -> 512 rows in round 4 with
# wider mixed dims (16..128) so the green driver row certifies hundreds of
# decodes across every fmt x size combination.
IMAGE_FIXTURE_SPEC = GenSpec(seed=42, n_images=512, n_urls=512, n_hosts=4,
                             img_sizes=(16, 32, 64, 96, 128),
                             near_dup_rate=0.125)
IMAGE_FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "images_512.parquet")


def _lum_x1000(px: np.ndarray) -> np.ndarray:
    """Integer luminance at x1000 (299/587/114 weights). Exact int64 — a
    float elementwise lum is deterministic, but any float REDUCTION over it
    (.mean()) is not reproducible across SIMD widths; keeping the scale
    integral lets every consumer reduce exactly."""
    return (299 * px[..., 0].astype(np.int64)
            + 587 * px[..., 1].astype(np.int64)
            + 114 * px[..., 2].astype(np.int64))


def _mean_lum_x100(px: np.ndarray) -> int:
    # == int(mean(lum) * 100) with exact integer arithmetic
    npix = px.shape[0] * px.shape[1]
    return int(_lum_x1000(px).sum() // (10 * npix))


def _lum_hist4(px: np.ndarray) -> list[int]:
    """4-bin luminance histogram (bins 0-63/64-127/128-191/192-255) — the
    deterministic image feature-extract used by textops.multimodal_pipeline
    and precomputed here as the oracle's expected values."""
    idx = np.minimum(_lum_x1000(px) // 1000, 255) // 64
    return [int((idx == b).sum()) for b in range(4)]


def ensure_image_fixture(path: str = IMAGE_FIXTURE_PATH) -> str:
    """Write the deterministic image fixture parquet if absent; returns the
    path. Atomic (temp + rename) so concurrent callers never see a torn
    file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    pdf = gen_image_caption(IMAGE_FIXTURE_SPEC)
    lum, lum2 = [], []
    for r in pdf.itertuples():
        dec = codecs.decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
        lum.append(_mean_lum_x100(dec))
        h2, w2 = int(r.h) // 2, int(r.w) // 2
        small = dec.reshape(h2, 2, w2, 2, 3).mean(axis=(1, 3)).astype("uint8")
        lum2.append(_mean_lum_x100(small))
    pdf["mean_lum_x100"] = np.asarray(lum, dtype=np.int64)
    pdf["mean_lum2_x100"] = np.asarray(lum2, dtype=np.int64)
    hists = []
    for r in pdf.itertuples():
        dec = codecs.decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
        hists.append(_lum_hist4(dec))
    for b in range(4):
        pdf[f"hist{b}"] = np.asarray([h[b] for h in hists], dtype=np.int64)
    schema = pa.schema([
        ("image_id", pa.string()), ("bytes", pa.binary()),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("caption", pa.string()), ("phash", pa.int64()),
        ("mean_lum_x100", pa.int64()), ("mean_lum2_x100", pa.int64()),
        ("hist0", pa.int64()), ("hist1", pa.int64()),
        ("hist2", pa.int64()), ("hist3", pa.int64()),
    ])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema,
                                        preserve_index=False), tmp)
    os.replace(tmp, path)
    return path


AUDIO_FIXTURE_PATH = os.path.join(os.path.dirname(IMAGE_FIXTURE_PATH),
                                  "audio_256.parquet")
VIDEO_FIXTURE_PATH = os.path.join(os.path.dirname(IMAGE_FIXTURE_PATH),
                                  "video_64.parquet")


def make_pcm(audio_id: str, n_samples: int, rate: int) -> np.ndarray:
    """Deterministic int16 PCM: two seeded sinusoids + seeded noise — the
    audio analog of codecs.make_pixels (opaque bytes a real decoder would
    produce; a real codec drops into the same binary column)."""
    seed = codecs.stable_seed("pcm:" + audio_id)
    rng = np.random.RandomState(seed)
    t = np.arange(n_samples, dtype=np.float64) / rate
    f1, f2 = rng.uniform(80, 800, size=2)
    amp = rng.uniform(0.2, 0.7)
    # codecs.sin_table, not np.sin: libm sine is not bit-reproducible
    # across environments (same fix as make_pixels)
    x = (amp * codecs.sin_table(2 * np.pi * f1 * t)
         + 0.3 * amp * codecs.sin_table(2 * np.pi * f2 * t))
    x = x + rng.uniform(-0.01, 0.01, size=n_samples)
    return np.clip(x * 32767.0, -32768, 32767).astype("<i2")


def ensure_audio_fixture(path: str = AUDIO_FIXTURE_PATH, n: int = 256) -> str:
    """256-row audio table: (audio_id, pcm:binary int16-LE, sample_rate,
    n_samples) + generator-expected features (duration_ms, rms_x10, peak) for
    the DuckDB oracle; the Spark query recomputes them from the bytes.
    Scaled 32 -> 256 rows in round 4 with wider rate/length mixes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    rng = np.random.RandomState(4242)
    rows = []
    for i in range(n):
        audio_id = f"aud_{i:08d}"
        rate = int(rng.choice([8000, 16000, 24000]))
        n_samples = int(rng.choice([4000, 8000, 12000, 16000, 24000]))
        pcm = make_pcm(audio_id, n_samples, rate)
        xi = pcm.astype(np.int64)
        # exact integer sum-of-squares; sqrt/div are IEEE-exact-rounded so
        # the staged expecteds regenerate identically on any machine
        rows.append({
            "audio_id": audio_id, "pcm": pcm.tobytes(),
            "sample_rate": rate, "n_samples": n_samples,
            "duration_ms": n_samples * 1000 // rate,
            "rms_x10": int(np.sqrt(float((xi * xi).sum()) / n_samples) * 10),
            "peak": int(np.abs(xi).max()),
        })
    pdf = pd.DataFrame(rows)
    schema = pa.schema([
        ("audio_id", pa.string()), ("pcm", pa.binary()),
        ("sample_rate", pa.int32()), ("n_samples", pa.int32()),
        ("duration_ms", pa.int64()), ("rms_x10", pa.int64()),
        ("peak", pa.int64()),
    ])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema,
                                        preserve_index=False), tmp)
    os.replace(tmp, path)
    return path


def ensure_video_fixture(path: str = VIDEO_FIXTURE_PATH, n: int = 64) -> str:
    """64-row video table: frames = n_frames raw RGB frames concatenated into
    one opaque binary column (+ typed metadata), the input_hint pattern for
    video. Expected columns (n_sampled at stride 4, mean sampled luminance)
    precomputed for the oracle; the Spark query frame-samples the bytes.
    Scaled 16 -> 64 rows in round 4 with wider dim/length mixes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    rng = np.random.RandomState(777)
    stride = 4
    rows = []
    for i in range(n):
        video_id = f"vid_{i:06d}"
        w = h = int(rng.choice([16, 32, 48]))
        n_frames = int(rng.choice([8, 12, 20, 32]))
        frames = [codecs.make_pixels(f"{video_id}/f{k}", w, h)
                  for k in range(n_frames)]
        sampled = frames[::stride]
        per_frame = [_mean_lum_x100(f) for f in sampled]
        rows.append({
            "video_id": video_id,
            "frames": b"".join(f.tobytes() for f in frames),
            "n_frames": n_frames, "w": w, "h": h,
            "n_sampled": len(sampled),
            "mean_lum_sampled_x100": int(sum(per_frame) // len(per_frame)),
        })
    pdf = pd.DataFrame(rows)
    schema = pa.schema([
        ("video_id", pa.string()), ("frames", pa.binary()),
        ("n_frames", pa.int32()), ("w", pa.int32()), ("h", pa.int32()),
        ("n_sampled", pa.int64()), ("mean_lum_sampled_x100", pa.int64()),
    ])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema,
                                        preserve_index=False), tmp)
    os.replace(tmp, path)
    return path


def _zipf_host_indices(rng: np.random.RandomState, n: int, n_hosts: int,
                       s: float) -> np.ndarray:
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    p = ranks ** (-s)
    p /= p.sum()
    return rng.choice(n_hosts, size=n, p=p)


def gen_frontier(spec: GenSpec) -> pd.DataFrame:
    """Frontier URL queue (FIXTURES.md §B). Includes deliberate duplicates
    (~dup_rate) and canonicalization twins (~dirty_rate) to exercise
    first-seen dedup and V1."""
    rng = np.random.RandomState(spec.seed + 1)
    n_base = int(spec.n_urls * (1.0 - spec.dup_rate))
    host_idx = _zipf_host_indices(rng, n_base, spec.n_hosts, spec.zipf_s)
    image_idx = rng.randint(0, spec.n_images, size=n_base)

    urls = []
    for j in range(n_base):
        host = _host_name(int(host_idx[j]))
        image_id = f"img_{int(image_idx[j]):012d}"
        path = "img"
        if rng.uniform() < spec.robots_block_rate:
            path = "private/img"
        urls.append(f"http://{host}/{path}/{image_id}")

    # duplicates: repeat earlier urls, sometimes as dirty canonicalization twins
    n_dup = spec.n_urls - n_base
    dup_src = rng.randint(0, n_base, size=n_dup)
    for j in range(n_dup):
        u = urls[int(dup_src[j])]
        r = rng.uniform()
        if r < spec.dirty_rate * 4:
            kind = rng.randint(4)
            if kind == 0:
                u = u.replace("http://host", "http://HOST", 1)
            elif kind == 1:
                u = u + "#frag"
            elif kind == 2:
                u = u.replace(".example.com/", ".example.com:80/", 1)
            else:
                u = u.replace("/img/", "/img/../img/./", 1)
        urls.append(u)

    n = len(urls)
    order = rng.permutation(n)
    urls = [urls[i] for i in order]
    priority = rng.randint(0, spec.n_strata, size=n).astype(np.int32)
    # seed list: make sure stratum 0 is populated deterministically
    seq = np.zeros(n, dtype=np.int64)
    for p in range(spec.n_strata):
        mask = priority == p
        seq[mask] = np.arange(int(mask.sum()), dtype=np.int64)

    df = pd.DataFrame({"url": urls, "priority": priority, "seq": seq})
    df["canonical_url"] = df["url"].map(canonicalize_url)
    df["url_hash"] = df["canonical_url"].map(hash64).astype(np.int64)
    df["host"] = df["url"].map(host_of)
    df["host_hash"] = df["host"].map(hash64).astype(np.int64)
    df["image_id"] = df["canonical_url"].str.extract(r"(img_\d{12})")[0]
    df["attempt"] = np.int32(0)
    df["not_before_epoch"] = np.int32(0)
    # microsecond precision: Spark's parquet reader rejects TIMESTAMP(NANOS)
    df["discovered_at"] = (BASE_EPOCH_TS + pd.to_timedelta(df["seq"], unit="s")
                           ).astype("datetime64[us, UTC]")
    df = df.drop(columns=["canonical_url"])
    return df[
        ["url", "url_hash", "host", "host_hash", "priority", "seq",
         "image_id", "attempt", "not_before_epoch", "discovered_at"]
    ]


def gen_robots(spec: GenSpec) -> pd.DataFrame:
    """Per-host robots rules; every host disallows /private/ (matches the
    frontier's robots_block_rate paths), a few add an extra prefix."""
    rng = np.random.RandomState(spec.seed + 2)
    rows = []
    for i in range(spec.n_hosts):
        prefixes = ["/private/"]
        if rng.uniform() < 0.2:
            prefixes.append("/tmp/")
        rows.append(
            {
                "host": _host_name(i),
                "disallow_prefixes": prefixes,
                "crawl_delay_ms": int(rng.choice([100, 250, 500, 1000])),
            }
        )
    return pd.DataFrame(rows)


def gen_budgets(spec: GenSpec) -> pd.DataFrame:
    """Per-host token buckets — integer math only (parity requirement)."""
    rng = np.random.RandomState(spec.seed + 3)
    rows = []
    for i in range(spec.n_hosts):
        capacity = int(rng.choice([4, 8, 16, 32]))
        rows.append(
            {
                "host": _host_name(i),
                "capacity": capacity,
                "refill_per_epoch": max(1, capacity // 2),
                "tokens": capacity,
                "backoff_until_epoch": 0,
            }
        )
    df = pd.DataFrame(rows)
    for c in ("capacity", "refill_per_epoch", "tokens", "backoff_until_epoch"):
        df[c] = df[c].astype(np.int32)
    return df
