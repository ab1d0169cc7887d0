"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches via mapInPandas.

The decode step defaults to a deterministic STUB (features derived from the
bytes themselves), so the Spark-side plumbing — schema, partitioning, UDF
signature, batch shape — is real and tested end-to-end with zero native
deps. ``require_real_decoder=True`` / ``require_real_resizer=True`` switch
to the REAL PIL-backed image decode/resize when PIL is importable (corrupt
bytes quarantine per-row as status='decode_error'; audio/video report
status='no_decoder' until an ffmpeg backend is plugged in), and raise
NotImplementedError when PIL is absent (this container). The real path is
pytest-covered with a clean skip where PIL is missing
(tests/test_multimodal_real.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha long, width int, height int, feat array<float>, status string"
)


def synth_media(spark, n: int = 256) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from id."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod("id", F.lit(3)) + 1).cast("int")).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        F.create_map(F.lit("codec"), F.lit("synthetic"), F.lit("src"), F.concat(F.lit("mem://"), F.col("id"))).alias("meta"),
    )
    return df


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for a real decoder: 8-dim 'features' from a
    rolling sum over payload bytes; width/height from byte prefix."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    w = int(arr[0]) % 64 + 1 if len(arr) else 1
    h = int(arr[1]) % 64 + 1 if len(arr) > 1 else 1
    if len(arr) == 0:
        return w, h, np.zeros(8, dtype=np.float32)
    chunks = np.array_split(arr, 8)
    feat = np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32) / 255.0
    return w, h, feat


def _real_image_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real image decoder (PIL, import-gated by the caller). Feature
    contract (8 floats, deterministic for identical bytes): per-channel RGB
    means (3) and stds (3) in [0,1], then log1p(width)/10, log1p(height)/10."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("RGB")
    w, h = img.size
    arr = np.asarray(img, dtype=np.float32) / 255.0
    feat = np.concatenate(
        [arr.mean(axis=(0, 1)), arr.std(axis=(0, 1)),
         np.array([np.log1p(w) / 10.0, np.log1p(h) / 10.0], dtype=np.float32)]
    ).astype(np.float32)
    return w, h, feat


def decode_features(df: DataFrame, require_real_decoder: bool = False) -> DataFrame:
    """mapInPandas decode/feature-extract stage. Arrow batches in/out; one
    output row per media row.

    require_real_decoder=True uses the REAL PIL decoder for kind='image'
    (rows whose bytes don't decode are quarantined as status='decode_error',
    never a job kill — at corpus scale one corrupt jpeg must not fail a
    partition); audio/video need ffmpeg (never present here) and come back
    status='no_decoder'. Without PIL installed the real path raises
    NotImplementedError at the first batch — the stub default stays the
    no-deps path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if require_real_decoder:
                try:
                    import PIL  # noqa: F401
                except ImportError as exc:
                    raise NotImplementedError(
                        "real image/audio decode requires PIL/ffmpeg — not available in this "
                        "environment; plug the decoder in here (signature: bytes -> (w, h, feat))"
                    ) from exc
            rows = {"media_id": [], "kind": [], "n_bytes": [], "sha": [], "width": [], "height": [], "feat": [], "status": []}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                if payload is None:
                    rows["n_bytes"].append(0)
                    rows["sha"].append(0)
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["feat"].append(np.zeros(8, dtype=np.float32))
                    rows["status"].append("null_payload")
                    continue
                rows["n_bytes"].append(len(payload))
                rows["sha"].append(int.from_bytes(bytes(payload)[:8], "big", signed=True) if len(payload) >= 8 else 0)
                if require_real_decoder:
                    if kind == "image":
                        try:
                            w, h, feat = _real_image_decode(bytes(payload))
                            status = "ok"
                        except Exception:
                            w, h, feat = 0, 0, np.zeros(8, dtype=np.float32)
                            status = "decode_error"
                    else:
                        w, h, feat = 0, 0, np.zeros(8, dtype=np.float32)
                        status = "no_decoder"
                else:
                    w, h, feat = _fake_decode(bytes(payload), kind)
                    status = "ok"
                rows["width"].append(w)
                rows["height"].append(h)
                rows["feat"].append(feat)
                rows["status"].append(status)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index —
    the explode shape a real frame extractor would fill. Frame count is
    derived deterministically from payload size (stub)."""
    frames = F.floor(F.length("payload") / 4).cast("int")
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("n_frames", frames)
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(frames - 1, F.lit(0)), F.lit(every_n))))
        .select("media_id", "n_frames", "frame_idx")
    )


RESIZE_SCHEMA = "media_id long, kind string, width int, height int, n_bytes long, resized_h60 long, status string"


def resize_plan(df: DataFrame, target_w: int = 32, target_h: int = 32,
                require_real_resizer: bool = False) -> DataFrame:
    """mapInPandas resize stage: payload -> resized payload at
    (target_w, target_h). Default is the STUB resizer: output bytes derived
    as sha256(payload || '{w}x{h}') — deterministic and recomputable by the
    SQL oracle — while the Spark-side contract (Arrow batches, one row out
    per row in, null-payload path, binary-in/binary-out schema) is the real
    plumbing. require_real_resizer=True uses PIL for kind='image' (resize ->
    PNG re-encode; undecodable bytes quarantine as status='decode_error');
    audio/video come back status='no_decoder'; without PIL it raises
    NotImplementedError at the first batch."""
    import hashlib

    suffix = f"{target_w}x{target_h}".encode()

    def _real_resize(payload: bytes) -> bytes:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        out = io.BytesIO()
        img.resize((target_w, target_h)).save(out, format="PNG")
        return out.getvalue()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if require_real_resizer:
                try:
                    import PIL  # noqa: F401
                except ImportError as exc:
                    raise NotImplementedError(
                        "real image resize requires PIL/ffmpeg — not available in this "
                        "environment; plug the resizer in here (signature: bytes, w, h -> bytes)"
                    ) from exc
            rows = {"media_id": [], "kind": [], "width": [], "height": [], "n_bytes": [], "resized_h60": [], "status": []}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                if payload is None:
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["n_bytes"].append(0)
                    rows["resized_h60"].append(0)
                    rows["status"].append("null_payload")
                    continue
                if require_real_resizer:
                    if kind == "image":
                        try:
                            png = _real_resize(bytes(payload))
                            digest = hashlib.sha256(png).hexdigest()
                            rows["width"].append(target_w)
                            rows["height"].append(target_h)
                            rows["n_bytes"].append(len(png))
                            rows["resized_h60"].append(int(digest[:15], 16))
                            rows["status"].append("ok")
                        except Exception:
                            rows["width"].append(0)
                            rows["height"].append(0)
                            rows["n_bytes"].append(0)
                            rows["resized_h60"].append(0)
                            rows["status"].append("decode_error")
                    else:
                        rows["width"].append(0)
                        rows["height"].append(0)
                        rows["n_bytes"].append(0)
                        rows["resized_h60"].append(0)
                        rows["status"].append("no_decoder")
                    continue
                out = hashlib.sha256(bytes(payload) + suffix).hexdigest()
                rows["width"].append(target_w)
                rows["height"].append(target_h)
                rows["n_bytes"].append(len(out))
                rows["resized_h60"].append(int(out[:15], 16))
                rows["status"].append("ok")
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)
