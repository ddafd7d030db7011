"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the decode kernels are
STUBS — a deterministic fake decoder behind ``fake=True`` and a
clearly-marked NotImplementedError otherwise. Everything Spark-side is
real and tested: schema, Arrow batch shape, partition-parallel
mapInArrow, metadata extraction.

At 100 TB the pattern matters more than the codec: binary payloads
stay columnar in parquet, the UDF sees Arrow buffers (no base64, no
per-row Python), and frame-sampling/resizing emit one row per sample
with explicit (doc_id, frame_idx) keys so downstream joins are
co-partitionable.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

MEDIA_DDL = "media_id long, kind string, payload binary, width int, height int, n_frames int"
FEATURE_DDL = "media_id long, frame_idx int, feature array<float>"


def synthesize_media(spark, n: int = 64, kind: str = "image", seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes are a
    pure function of (seed, media_id)."""
    import pyarrow as pa

    def gen(iterator):
        for tbl in iterator:
            ids = tbl.column("id").to_numpy()
            payloads, w, h, f = [], [], [], []
            for i in ids:
                rng = np.random.Generator(np.random.PCG64(seed + int(i)))
                w.append(int(rng.integers(8, 32)))
                h.append(int(rng.integers(8, 32)))
                f.append(1 if kind == "image" else int(rng.integers(2, 10)))
                payloads.append(rng.integers(0, 256, size=w[-1] * h[-1] * f[-1], dtype=np.uint8).tobytes())
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "kind": pa.array([kind] * len(ids)),
                    "payload": pa.array(payloads, pa.binary()),
                    "width": pa.array(w, pa.int32()),
                    "height": pa.array(h, pa.int32()),
                    "n_frames": pa.array(f, pa.int32()),
                }
            )

    return spark.range(0, n, 1, 4).mapInArrow(gen, schema=MEDIA_DDL)


def decode_and_featurize(df: DataFrame, frames_per_media: int = 2, fake: bool = True) -> DataFrame:
    """Frame-sample + feature-extract each media payload.

    fake=True: deterministic 8-dim mean-of-bytes "feature" per sampled
    frame (real Arrow plumbing, fake decode). fake=False: raises
    NotImplementedError — a real deployment plugs pillow/ffmpeg here.
    """
    import pyarrow as pa

    def feat(iterator):
        for tbl in iterator:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode needs codec libs not present in this container; "
                    "plug a decoder into decode_and_featurize()"
                )
            mids = tbl.column("media_id").to_numpy()
            ws = tbl.column("width").to_numpy()
            hs = tbl.column("height").to_numpy()
            fs = tbl.column("n_frames").to_numpy()
            payload = tbl.column("payload")
            out_ids, out_fidx, out_feat = [], [], []
            for i in range(len(tbl)):
                raw = np.frombuffer(payload[i].as_py(), dtype=np.uint8)
                frame_sz = int(ws[i]) * int(hs[i])
                take = min(frames_per_media, int(fs[i]))
                for j in range(take):
                    frame = raw[j * frame_sz : (j + 1) * frame_sz].astype(np.float32)
                    chunks = np.array_split(frame, 8)
                    out_ids.append(int(mids[i]))
                    out_fidx.append(j)
                    out_feat.append([float(c.mean()) if c.size else 0.0 for c in chunks])
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": pa.array(out_ids, pa.int64()),
                    "frame_idx": pa.array(out_fidx, pa.int32()),
                    "feature": pa.array(out_feat, pa.list_(pa.float32())),
                }
            )

    return df.mapInArrow(feat, schema=FEATURE_DDL)
