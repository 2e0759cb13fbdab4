"""Micro-bench for the multimodal UDF inner loops (VERDICT r2 #4 evidence).

Times the exact per-Arrow-batch work the mapInPandas UDFs do — audio feature
extraction and video luminance sampling — comparing the two candidate inner
loops for each. Prints one JSON line; the result is recorded in BENCH.md.

Findings this encodes (the shipped choices):

* **audio**: the SHIPPED path is the per-row loop (`audio_rowloop` ==
  textops.audio_features). Each 4k-24k-sample buffer is already one
  cache-resident vectorized numpy reduction; stacking equal-length buffers
  into a 2-D array (`audio_stacked`, the rejected r2-advice variant) turns
  those cache hits into DRAM-streaming passes over 100+ MB arrays and
  measures 3x slower on an idle box and 30-40x slower under concurrent memory load on this bandwidth-bound host.
* **video**: the SHIPPED path is the vectorized per-frame reduction
  (`video_vectorized` == textops.video_frame_sample) — the per-FRAME Python
  loop it replaced (`video_rowloop`, r2 code) did interpreter-dominated work
  on tiny (16x16..32x32) frames, where batching the frames of one video into
  a single reduction genuinely wins.

No Spark session: the UDF body is plain pandas/numpy per Arrow batch, so the
inner-loop comparison measures directly (Arrow transfer cost is identical
for both implementations).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawlspark import datagen  # noqa: E402

N_AUDIO = 10_000
N_VIDEO = 2_000


def gen_audio_batch(n: int) -> pd.DataFrame:
    rng = np.random.RandomState(1234)
    rows = []
    for i in range(n):
        rate = int(rng.choice([8000, 16000]))
        n_samples = int(rng.choice([4000, 8000, 12000]))
        pcm = datagen.make_pcm(f"aud_{i:08d}", n_samples, rate)
        rows.append({"audio_id": f"aud_{i:08d}", "pcm": pcm.tobytes(),
                     "sample_rate": rate, "n_samples": n_samples})
    return pd.DataFrame(rows)


def audio_rowloop(pdf: pd.DataFrame) -> pd.DataFrame:
    """SHIPPED implementation (textops.audio_features _feats body): per-row
    frombuffer + per-row cache-resident reductions."""
    rows = []
    for r in pdf.itertuples():
        x = np.frombuffer(r.pcm, dtype="<i2").astype(np.float64)
        rows.append({
            "audio_id": r.audio_id,
            "n_samples_dec": len(x),
            "duration_ms": len(x) * 1000 // int(r.sample_rate),
            "rms_x10": int(np.sqrt((x * x).mean()) * 10),
            "peak": int(np.abs(x).max()),
        })
    return pd.DataFrame(rows)


def audio_stacked(pdf: pd.DataFrame) -> pd.DataFrame:
    """REJECTED alternative: stack equal-length buffers, reduce along
    axis=1 — bit-identical results, but DRAM-streaming instead of
    cache-resident (see module docstring)."""
    n = len(pdf)
    n_dec = np.zeros(n, dtype=np.int64)
    dur = np.zeros(n, dtype=np.int64)
    rms = np.zeros(n, dtype=np.int64)
    peak = np.zeros(n, dtype=np.int64)
    lens = pdf["pcm"].map(len).to_numpy()
    rates = pdf["sample_rate"].to_numpy().astype(np.int64)
    for L in np.unique(lens):
        idx = np.nonzero(lens == L)[0]
        x = np.stack([np.frombuffer(pdf["pcm"].iat[int(i)], dtype="<i2")
                      for i in idx]).astype(np.float64)
        ns = x.shape[1]
        n_dec[idx] = ns
        dur[idx] = ns * 1000 // rates[idx]
        rms[idx] = (np.sqrt((x * x).mean(axis=1)) * 10).astype(np.int64)
        peak[idx] = np.abs(x).max(axis=1).astype(np.int64)
    return pd.DataFrame({"audio_id": pdf["audio_id"].to_numpy(),
                         "n_samples_dec": n_dec, "duration_ms": dur,
                         "rms_x10": rms, "peak": peak})


def gen_video_batch(n: int) -> pd.DataFrame:
    rng = np.random.RandomState(4321)
    rows = []
    for i in range(n):
        w = h = int(rng.choice([16, 32]))
        nf = int(rng.choice([8, 12, 20]))
        frames = rng.randint(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
        rows.append({"video_id": f"vid_{i:06d}",
                     "frames": frames.tobytes(),
                     "n_frames": nf, "w": w, "h": h})
    return pd.DataFrame(rows)


def video_rowloop(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in pdf.itertuples():
        nf, w, h = int(r.n_frames), int(r.w), int(r.h)
        arr = np.frombuffer(r.frames, dtype=np.uint8).reshape(nf, h, w, 3)
        sampled = arr[::4]
        lum = float(np.mean([datagen._mean_lum_x100(f) for f in sampled]))
        rows.append({"video_id": r.video_id, "n_frames": nf,
                     "bytes_per_frame": w * h * 3,
                     "n_sampled": int(sampled.shape[0]),
                     "mean_lum_sampled_x100": int(lum)})
    return pd.DataFrame(rows)


def video_vectorized(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in pdf.itertuples():
        nf, w, h = int(r.n_frames), int(r.w), int(r.h)
        arr = np.frombuffer(r.frames, dtype=np.uint8).reshape(nf, h, w, 3)
        sampled = arr[::4]
        lum = (0.299 * sampled[..., 0] + 0.587 * sampled[..., 1]
               + 0.114 * sampled[..., 2])
        per_frame = (lum.reshape(lum.shape[0], -1).mean(axis=1)
                     * 100).astype(np.int64)
        rows.append({"video_id": r.video_id, "n_frames": nf,
                     "bytes_per_frame": w * h * 3,
                     "n_sampled": int(sampled.shape[0]),
                     "mean_lum_sampled_x100": int(per_frame.mean())})
    return pd.DataFrame(rows)


def best_of(fn, pdf, reps: int = 3) -> tuple[float, pd.DataFrame]:
    best, out = float("inf"), None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(pdf)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> None:
    audio = gen_audio_batch(N_AUDIO)
    t_row, out_row = best_of(audio_rowloop, audio)
    t_stk, out_stk = best_of(audio_stacked, audio)
    assert out_row.sort_values("audio_id").reset_index(drop=True).equals(
        out_stk.sort_values("audio_id").reset_index(drop=True)), "audio parity"

    video = gen_video_batch(N_VIDEO)
    v_row, vout_row = best_of(video_rowloop, video)
    v_vec, vout_vec = best_of(video_vectorized, video)
    assert vout_row.equals(vout_vec), "video parity"

    result = {
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "audio_rows": N_AUDIO,
        "audio_shipped_rowloop_s": round(t_row, 3),
        "audio_rejected_stacked_s": round(t_stk, 3),
        "audio_shipped_speedup_vs_stacked": round(t_stk / t_row, 2),
        "video_rows": N_VIDEO,
        "video_rejected_frameloop_s": round(v_row, 3),
        "video_shipped_vectorized_s": round(v_vec, 3),
        "video_shipped_speedup": round(v_row / v_vec, 2),
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MULTIMODAL_BENCH.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
