"""Pure-numpy image codecs, PSNR, perceptual hash, and procedural image/caption
generation.

These functions are the single source of truth shared by three consumers:

* the deterministic data generator (``crawlspark.datagen``),
* the vectorized payload-validation pandas UDFs (``crawlspark.operators.validate``),
* the pure-Python reference-semantics oracle (``crawlspark.oracle.simulator``).

They are intentionally Spark-free (numpy only) so a single implementation is
exercised everywhere; determinism is a hard requirement for crawl-ordering
parity (SURVEY.md §5.2).

Reference parity notes: the reference crawler has no image payloads (it crawls
GitHub repo metadata); the image+caption payload and the per-row invariant
(decoded-pixel PSNR>=40dB for lossy formats, exact caption equality, phash
recompute) come from BASELINE.json ``input_hint``. Codec set per FIXTURES.md:
``raw`` (RGB24), ``rle`` (lossless run-length), ``qdct`` (lossy quantized 8x8
DCT tuned for round-trip PSNR>=40dB).
"""

from __future__ import annotations

import hashlib

import numpy as np

FORMATS = ("raw", "rle", "qdct")

# Quantization step for the qdct codec. Uniform step q gives expected MSE of
# ~q^2/12 per coefficient; the DCT basis is orthonormal so pixel-domain MSE is
# the same: q=4 -> MSE ~1.33 -> PSNR ~46.9 dB, comfortably above the 40 dB
# invariant while still being genuinely lossy.
QDCT_STEP = 4.0
_BLOCK = 8


def stable_seed(s: str) -> int:
    """Deterministic 32-bit seed from a string (md5-based; no PYTHONHASHSEED
    dependence)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# Procedural image + caption generation (seeded, deterministic)
# ---------------------------------------------------------------------------

_ADJECTIVES = (
    "red", "blue", "green", "golden", "silver", "tiny", "huge", "quiet",
    "bright", "dark", "ancient", "modern", "fuzzy", "smooth", "wild", "calm",
)
_NOUNS = (
    "fox", "river", "mountain", "city", "forest", "harbor", "lantern",
    "bridge", "garden", "tower", "meadow", "island", "comet", "glacier",
    "canyon", "orchard",
)


# 4096-entry quantized sine table (values are exact multiples of 2^-15).
# np.sin/np.cos are NOT bit-reproducible across numpy/libm/SIMD variants; a
# table lookup keyed by floor(angle * N/2pi) uses only IEEE-exact arithmetic
# (+,*,floor), so the same seed yields the same pixels on every machine.
# Boundary safety: no scaled table entry sits within 1e-6 of a .5 rounding
# boundary (checked in tests/test_codecs.py), so the table itself is also
# environment-independent.
_SINE_N = 1 << 12
_SINE_TABLE = (np.rint(np.sin(np.arange(_SINE_N) * (2.0 * np.pi / _SINE_N))
                       * 32768.0) / 32768.0)


def sin_table(angle: np.ndarray) -> np.ndarray:
    """Deterministic sine: quantized table lookup (see _SINE_TABLE note)."""
    idx = np.floor(np.asarray(angle, dtype=np.float64)
                   * (_SINE_N / (2.0 * np.pi))).astype(np.int64) % _SINE_N
    return _SINE_TABLE[idx]


def make_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic procedural RGB image (h, w, 3) uint8: smooth gradient +
    sinusoid + seeded noise. Integer/IEEE-exact-only arithmetic so committed
    fixtures regenerate bit-identically on any machine."""
    seed = stable_seed(image_id)
    rng = np.random.RandomState(seed)
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    phase = rng.uniform(0, 2 * np.pi, size=3)
    freq = rng.uniform(0.05, 0.30, size=3)
    out = np.empty((h, w, 3), dtype=np.float64)
    for c in range(3):
        grad = (xx / max(w - 1, 1)) * 96.0 + (yy / max(h - 1, 1)) * 96.0
        wave = 48.0 * sin_table(freq[c] * (xx + yy) + phase[c])
        out[..., c] = 32.0 + grad + wave
    noise = rng.randint(-8, 9, size=(h, w, 3)).astype(np.float64)
    return np.clip(out + noise, 0, 255).astype(np.uint8)


def make_caption(image_id: str) -> str:
    """Deterministic caption: 'a {adj} {noun} near a {noun}'."""
    seed = stable_seed("cap:" + image_id)
    rng = np.random.RandomState(seed)
    adj = _ADJECTIVES[rng.randint(len(_ADJECTIVES))]
    n1 = _NOUNS[rng.randint(len(_NOUNS))]
    n2 = _NOUNS[rng.randint(len(_NOUNS))]
    return f"a {adj} {n1} near a {n2}"


# ---------------------------------------------------------------------------
# Codecs
# ---------------------------------------------------------------------------

def _encode_raw(px: np.ndarray) -> bytes:
    return px.astype(np.uint8).tobytes()


def _decode_raw(buf: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)


def _encode_rle(px: np.ndarray) -> bytes:
    """Byte-level run-length coding: (count:uint8, value:uint8) pairs,
    runs capped at 255. Lossless."""
    flat = px.astype(np.uint8).ravel()
    if flat.size == 0:
        return b""
    # boundaries where the value changes
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [flat.size]))
    counts = ends - starts
    values = flat[starts]
    # split runs longer than 255
    full = counts // 255
    rem = counts % 255
    out_counts = []
    out_values = []
    for cnt, val, f, r in zip(counts, values, full, rem):
        if f:
            out_counts.append(np.full(f, 255, dtype=np.uint8))
            out_values.append(np.full(f, val, dtype=np.uint8))
        if r:
            out_counts.append(np.array([r], dtype=np.uint8))
            out_values.append(np.array([val], dtype=np.uint8))
    cc = np.concatenate(out_counts)
    vv = np.concatenate(out_values)
    inter = np.empty(cc.size * 2, dtype=np.uint8)
    inter[0::2] = cc
    inter[1::2] = vv
    return inter.tobytes()


def _decode_rle(buf: bytes, w: int, h: int) -> np.ndarray:
    arr = np.frombuffer(buf, dtype=np.uint8)
    counts = arr[0::2].astype(np.int64)
    values = arr[1::2]
    flat = np.repeat(values, counts)
    return flat.reshape(h, w, 3)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n x n)."""
    k = np.arange(n, dtype=np.float64)
    mat = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    mat *= np.sqrt(2.0 / n)
    mat[0, :] = np.sqrt(1.0 / n)
    return mat


_DCT8 = _dct_matrix(_BLOCK)
_DCT32 = _dct_matrix(32)

# Fixed-point DCT bases. The float matmul path (BLAS) is NOT bit-reproducible
# across environments — different kernels/FMA orders shift results by ulps,
# and a `rint` sitting on a .5 boundary then flips a quantized coefficient,
# so the same seed produced different committed-fixture bytes on different
# machines (caught by test_staged_fixtures_deterministic round 4). Integer
# matmuls are exact, making encode/decode/phash bit-identical everywhere.
# Scale choice bounds the int64 intermediates: 8x8 path peaks ~2^53,
# 32x32 phash path ~2^58 (see _phash_fx), both < 2^63.
_FX8_SHIFT = 16
_FX32_SHIFT = 14
_DCT8_FX = np.rint(_DCT8 * (1 << _FX8_SHIFT)).astype(np.int64)
_DCT32_FX = np.rint(_DCT32 * (1 << _FX32_SHIFT)).astype(np.int64)


def _div_round_half_away(num: np.ndarray, denom: int) -> np.ndarray:
    """Exact integer divide with round-half-away-from-zero (symmetric, no
    float in the loop — the deterministic replacement for np.rint)."""
    half = denom // 2
    return np.where(num >= 0, (num + half) // denom,
                    -((-num + half) // denom))


def _blockify(chan: np.ndarray) -> np.ndarray:
    """(h, w) -> (nblocks, 8, 8); h and w must be multiples of 8."""
    h, w = chan.shape
    return (chan.reshape(h // _BLOCK, _BLOCK, w // _BLOCK, _BLOCK)
                .transpose(0, 2, 1, 3)
                .reshape(-1, _BLOCK, _BLOCK))


def _unblockify(blocks: np.ndarray, w: int, h: int) -> np.ndarray:
    return (blocks.reshape(h // _BLOCK, w // _BLOCK, _BLOCK, _BLOCK)
                  .transpose(0, 2, 1, 3)
                  .reshape(h, w))


def _encode_qdct(px: np.ndarray) -> bytes:
    """Lossy codec: per-channel 8x8 block DCT, uniform quantization, int16
    coefficients. Requires w and h to be multiples of 8 (guaranteed by the
    generator: sizes in {16, 32, 64})."""
    h, w, _ = px.shape
    # forward transform in fixed point: blocks are exact int64, the two
    # integer matmuls carry scale 2^(2*_FX8_SHIFT); quantization folds the
    # scale into the divisor (QDCT_STEP is integral), all exact.
    denom = int(QDCT_STEP) << (2 * _FX8_SHIFT)
    chans = []
    for c in range(3):
        blocks = _blockify(px[..., c].astype(np.int64) - 128)
        coefs = _DCT8_FX @ blocks @ _DCT8_FX.T
        q = _div_round_half_away(coefs, denom).astype(np.int16)
        chans.append(q.ravel())
    return np.concatenate(chans).astype("<i2").tobytes()


def _decode_qdct(buf: bytes, w: int, h: int) -> np.ndarray:
    arr = np.frombuffer(buf, dtype="<i2").astype(np.int64) * int(QDCT_STEP)
    per_chan = (h * w)
    denom = 1 << (2 * _FX8_SHIFT)
    out = np.empty((h, w, 3), dtype=np.int64)
    for c in range(3):
        coefs = arr[c * per_chan:(c + 1) * per_chan].reshape(-1, _BLOCK, _BLOCK)
        blocks = _DCT8_FX.T @ coefs @ _DCT8_FX
        out[..., c] = _unblockify(_div_round_half_away(blocks, denom),
                                  w, h) + 128
    return np.clip(out, 0, 255).astype(np.uint8)


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return _encode_raw(px)
    if fmt == "rle":
        return _encode_rle(px)
    if fmt == "qdct":
        return _encode_qdct(px)
    raise ValueError(f"unknown fmt: {fmt}")


def decode_image(buf: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return _decode_raw(buf, w, h)
    if fmt == "rle":
        return _decode_rle(buf, w, h)
    if fmt == "qdct":
        return _decode_qdct(buf, w, h)
    raise ValueError(f"unknown fmt: {fmt}")


def is_lossless(fmt: str) -> bool:
    return fmt in ("raw", "rle")


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    # exact integer sum-of-squares (a float .mean() reduction's pairwise
    # blocking varies with SIMD width across environments)
    diff = a.astype(np.int64) - b.astype(np.int64)
    mse = float(np.sum(diff * diff)) / diff.size
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(px: np.ndarray) -> int:
    """64-bit perceptual hash: grayscale -> 32x32 area/nearest resize ->
    orthonormal 2-D DCT -> top-left 8x8 coefficients -> sign vs. the median of
    the 63 AC coefficients (DC bit compared against the same median).
    Returned as a signed int64 (two's complement)."""
    # Integer end to end (same cross-environment reproducibility argument as
    # the qdct codec): luminance at x1000, area resize kept as an exact SUM
    # (uniform per-image scale factor — sign-vs-median is scale-invariant),
    # fixed-point DCT, integer median of 63 ints. Peak magnitude: gray <=
    # 255*1000*(fh*fw) ~ 2^24 at 128x128; two 32-term matmuls at 2^14 scale
    # add 2*(14+5) bits -> ~2^62 worst case, within int64.
    gray = (299 * px[..., 0].astype(np.int64)
            + 587 * px[..., 1].astype(np.int64)
            + 114 * px[..., 2].astype(np.int64))
    h, w = gray.shape
    if (h, w) != (32, 32):
        if h % 32 == 0 and w % 32 == 0:
            fh, fw = h // 32, w // 32
            gray = gray.reshape(32, fh, 32, fw).sum(axis=(1, 3))
        else:
            yi = (np.arange(32) * h) // 32
            xi = (np.arange(32) * w) // 32
            gray = gray[np.ix_(yi, xi)]
    coefs = _DCT32_FX @ gray @ _DCT32_FX.T
    block = coefs[:8, :8].ravel()
    med = int(np.sort(block[1:])[31])    # 63 values -> the exact middle one
    # (np.partition-free for clarity; int64 throughout — np.median would
    # round-trip through float64 and lose exactness past 2^53)
    bits = block > med
    val = 0
    for i in range(64):
        if bits[i]:
            val |= 1 << i
    if val >= 1 << 63:
        val -= 1 << 64
    return val
