"""Counted-failure evidence for compressed-codec seams at 10k rows
(VERDICT r4 item 7, fallback arm): prove that mp3/mp4/h264 blobs — the
formats whose decode is a documented NotImplementedError seam — flow
through the FULL Spark media path (Arrow-batched mapInPandas,
KindDispatchBackend) as counted per-row errors, never as a job abort,
while the real decoders (WAV, Y4M, PNG/JPEG headers aside) keep decoding
their rows in the same job.

Synthesizes a deterministic 10k-row media table (seeded numpy, no
external data, no wall clock):
  - 40% valid WAV  (real decode: 16-bit PCM, stdlib-write header)
  - 10% valid Y4M  (real decode: tiny 420jpeg streams)
  - 25% MP3-shaped (0xFFFB frame sync or ID3v2 header + noise)
  - 20% MP4-shaped (ftyp isom box + noise)
  - 5%  truncated/garbage (empty, 3 bytes, wrong magic)

Asserts and records: the job COMPLETES, every row comes back exactly
once, failures carry typed decode_error strings by family, successes
carry features, and throughput. Artifact: BENCH/r5/media_counted_failures.json.

Usage: python tools/media_counted_failures.py [n_rows] [out_json]
"""

from __future__ import annotations

import json
import struct
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from globalign_spark.ops import multimodal  # noqa: E402
from globalign_spark.session import get_spark  # noqa: E402


def wav_bytes(rng: np.random.Generator, n_samples: int = 400) -> bytes:
    pcm = (rng.integers(-2000, 2000, n_samples)).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm


def y4m_bytes(rng: np.random.Generator) -> bytes:
    w, h, n = 8, 8, 2
    out = [b"YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C420jpeg\n"]
    for _ in range(n):
        out.append(b"FRAME\n")
        out.append(rng.integers(0, 256, w * h).astype(np.uint8).tobytes())
        out.append(
            rng.integers(0, 256, (w // 2) * (h // 2) * 2)
            .astype(np.uint8)
            .tobytes()
        )
    return b"".join(out)


def mp3_bytes(rng: np.random.Generator, i: int) -> bytes:
    body = rng.integers(0, 256, 300).astype(np.uint8).tobytes()
    if i % 2 == 0:
        return b"\xff\xfb\x90\x64" + body  # MPEG1 L3 frame sync
    return b"ID3\x04\x00\x00\x00\x00\x00\x00" + body  # ID3v2 tag


def mp4_bytes(rng: np.random.Generator) -> bytes:
    body = rng.integers(0, 256, 300).astype(np.uint8).tobytes()
    return (
        struct.pack(">I", 24)
        + b"ftypisom\x00\x00\x02\x00isomiso2"
        + body
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    out_json = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "BENCH/r5/media_counted_failures.json"
    )
    rng = np.random.Generator(np.random.Philox(7))
    rows = []
    for i in range(n_rows):
        r = i % 100
        if r < 40:
            rows.append((i, "audio", "wav_ok", wav_bytes(rng)))
        elif r < 50:
            rows.append((i, "video", "y4m_ok", y4m_bytes(rng)))
        elif r < 75:
            rows.append((i, "audio", "mp3_seam", mp3_bytes(rng, i)))
        elif r < 95:
            rows.append((i, "video", "mp4_seam", mp4_bytes(rng)))
        elif r < 97:
            rows.append((i, "audio", "empty", b""))
        elif r < 99:
            rows.append((i, "image", "garbage", b"\x00\x01\x02"))
        else:
            rows.append((i, "video", "garbage", b"nonsense-bytes"))

    spark = get_spark("media_counted_failures")
    media = spark.createDataFrame(
        rows, "media_id long, kind string, family string, blob binary"
    ).repartition(32)
    feats = multimodal.extract_media_features(
        media.select("media_id", "kind", "blob"),
        backend=multimodal.KindDispatchBackend(),
    )
    t0 = time.monotonic()
    per_family = (
        feats.join(
            media.select("media_id", "family"), "media_id"
        )
        .groupBy("family")
        .agg(
            F.count("*").alias("rows"),
            F.sum(
                F.when(F.col("decode_error").isNull(), 1).otherwise(0)
            ).alias("decoded"),
            F.sum(
                F.when(F.col("decode_error").isNotNull(), 1).otherwise(0)
            ).alias("failed"),
            F.first("decode_error", ignorenulls=True).alias("sample_error"),
        )
        .orderBy("family")
        .collect()
    )
    wall = time.monotonic() - t0

    fam = {r["family"]: r.asDict() for r in per_family}
    total = sum(r["rows"] for r in fam.values())
    # the evidence: full-row accounting, seams 100% counted, real decoders
    # 100% decoded, in ONE completed job
    assert total == n_rows, (total, n_rows)
    assert fam["wav_ok"]["decoded"] == fam["wav_ok"]["rows"]
    assert fam["y4m_ok"]["decoded"] == fam["y4m_ok"]["rows"]
    for seam in ("mp3_seam", "mp4_seam", "empty", "garbage"):
        assert fam[seam]["failed"] == fam[seam]["rows"], fam[seam]
    out = {
        "n_rows": n_rows,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_rows / wall, 1),
        "master": spark.sparkContext.master,
        "families": fam,
        "job_completed": True,
    }
    Path(out_json).parent.mkdir(parents=True, exist_ok=True)
    Path(out_json).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
