"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque ``binary``
columns beside typed metadata, decoding only inside Arrow-batched Python
(`mapInPandas`) at the last moment. Codec access is import-gated per
modality: images decode via Pillow when installed, audio via soundfile when
installed with a stdlib ``wave`` PCM fallback that works everywhere; video
decode remains a clearly-marked stub (ffmpeg seam). Everything Spark-side —
schema, batching, partition behavior, UDF signatures — is real and tested in
every branch.

``synthesize_assets`` manufactures a deterministic binary corpus from the
documents table so the plumbing has data to flow through (utf-8 payload +
per-modality magic prefix).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = {"image": b"\x89IMG", "audio": b"AUD0", "video": b"VID0"}
MODALITIES = tuple(MAGIC)

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("magic_ok", T.BooleanType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("checksum", T.StringType(), False),
    ]
)


def synthesize_assets(docs: DataFrame) -> DataFrame:
    """documents -> deterministic binary asset table (modality by doc_id % 3)."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(MAGIC["image"]))
        .when(F.col("doc_id") % 3 == 1, F.lit(MAGIC["audio"]))
        .otherwise(F.lit(MAGIC["video"]))
    )
    payload = F.concat(magic, F.encode(F.col("text"), "utf-8"))
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).cast("int").alias("n_bytes"),
    )


def _pil_image_module():
    """Import-gated Pillow handle (None when the codec lib is absent)."""
    try:
        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        return None
    return Image


def decode_image(payload: bytes) -> object:
    """Decode an image payload with Pillow WHEN IMPORTABLE; the sandbox image
    lacks codec libs, so the stub branch raises (clearly marked seam — real
    deployments get the live path with no code change)."""
    Image = _pil_image_module()
    if Image is None:
        raise NotImplementedError(
            "image codec not available in this environment"
        )
    import io

    return Image.open(io.BytesIO(bytes(payload)))


IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)


def extract_image_features(assets: DataFrame) -> DataFrame:
    """Real-codec image feature extraction over binary payloads, Arrow-batched
    (`mapInPandas`), import-gated: when Pillow is present on the executors the
    kernel decodes each payload and emits true (width, height, mode); when it
    is not (this sandbox), rows come back ``decoded=false`` with null dims —
    the Spark-side plumbing (schema, batching, per-asset row contract) is
    identical either way, so wiring the codec is a pure library install.
    """

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil_image_module()
        import io

        for pdf in batches:
            out = {
                "asset_id": pdf["asset_id"],
                "decoded": [],
                "width": [],
                "height": [],
                "mode": [],
                "n_bytes": pdf["payload"].str.len().astype("int32"),
            }
            for p in pdf["payload"]:
                if Image is None:
                    out["decoded"].append(False)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mode"].append(None)
                    continue
                try:
                    with Image.open(io.BytesIO(bytes(p))) as im:
                        out["decoded"].append(True)
                        out["width"].append(im.width)
                        out["height"].append(im.height)
                        out["mode"].append(im.mode)
                except Exception:
                    out["decoded"].append(False)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mode"].append(None)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(
        _kernel, IMAGE_FEATURE_SCHEMA
    )


def _soundfile_module():
    """Import-gated soundfile handle (None when the codec lib is absent)."""
    try:
        import soundfile  # type: ignore[import-not-found]
    except ImportError:
        return None
    return soundfile


def _wave_info(payload: bytes):
    """Stdlib-wave fallback decoder: PCM WAV only, zero dependencies.
    Returns (sample_rate, n_channels, n_samples) or None."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
            return w.getframerate(), w.getnchannels(), w.getnframes()
    except Exception:
        return None


def decode_audio(payload: bytes) -> dict:
    """Audio header decode, import-gated like the image path: soundfile when
    installed (any libsndfile format), stdlib ``wave`` as the PCM-WAV
    fallback (always available), NotImplementedError only when neither can
    read the payload — real deployments plug ffmpeg at this seam."""
    sf = _soundfile_module()
    if sf is not None:
        import io

        try:
            info = sf.info(io.BytesIO(bytes(payload)))
            return {
                "codec": "soundfile",
                "sample_rate": int(info.samplerate),
                "n_channels": int(info.channels),
                "n_samples": int(info.frames),
            }
        except Exception:
            pass
    w = _wave_info(payload)
    if w is not None:
        return {
            "codec": "wave",
            "sample_rate": w[0],
            "n_channels": w[1],
            "n_samples": w[2],
        }
    raise NotImplementedError(
        "audio codec not available for this payload in this environment"
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("codec", T.StringType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """Real-codec audio feature extraction over binary payloads, Arrow-batched
    (`mapInPandas`), same ``decoded``-flag contract as
    ``extract_image_features``: soundfile decodes any libsndfile format when
    installed; the stdlib ``wave`` fallback decodes PCM WAV everywhere (so
    this path genuinely exercises decode even in this sandbox); undecodable
    rows come back ``decoded=false`` with null fields. The Spark-side
    plumbing (schema, batching, per-asset row contract) is identical in
    every branch, so widening codec support is a pure library install.
    """

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": pdf["asset_id"],
                "decoded": [],
                "codec": [],
                "sample_rate": [],
                "n_channels": [],
                "n_samples": [],
                "duration_s": [],
                "n_bytes": pdf["payload"].str.len().astype("int32"),
            }
            for p in pdf["payload"]:
                try:
                    info = decode_audio(p)
                except NotImplementedError:
                    out["decoded"].append(False)
                    out["codec"].append(None)
                    out["sample_rate"].append(None)
                    out["n_channels"].append(None)
                    out["n_samples"].append(None)
                    out["duration_s"].append(None)
                    continue
                out["decoded"].append(True)
                out["codec"].append(info["codec"])
                out["sample_rate"].append(info["sample_rate"])
                out["n_channels"].append(info["n_channels"])
                out["n_samples"].append(info["n_samples"])
                out["duration_s"].append(
                    info["n_samples"] / info["sample_rate"]
                    if info["sample_rate"]
                    else None
                )
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(
        _kernel, AUDIO_FEATURE_SCHEMA
    )


def extract_features(assets: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (`mapInPandas`).

    The deterministic fake kernel stands in for decode+featurize: it validates
    the magic prefix, derives a frame count from payload length, and computes
    a driver-independent checksum. Batch shape/partitioning is exactly what a
    real decoder would see — swap `_fake_kernel` for a real codec per modality.
    """

    def _fake_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            # vectorized length/slice/compare over the Arrow batch; only the
            # checksum stays per-row — it stands in for the real per-asset
            # codec call, which is inherently per-row anyway
            lens = payloads.str.len()
            magics = pdf["modality"].map(MAGIC)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": lens.astype("int32"),
                    "magic_ok": payloads.str.slice(0, 4).eq(magics),
                    "n_frames": (lens // 100).clip(lower=1).astype("int32"),
                    # checksum over the lowercase-hex encoding (not raw bytes):
                    # keeps the oracle portable — DuckDB's md5 is VARCHAR-only
                    "checksum": payloads.map(
                        lambda p: hashlib.md5(bytes(p).hex().encode()).hexdigest()
                    ),
                }
            )

    return assets.mapInPandas(_fake_kernel, FEATURE_SCHEMA)


# Oracle twin for the fake kernel (DuckDB): same features from the same
# synthesized payloads.
FEATURES_SQL = """
WITH assets AS (
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           (CASE WHEN doc_id % 3 = 0 THEN '\\x89IMG'::BLOB
                 WHEN doc_id % 3 = 1 THEN 'AUD0'::BLOB
                 ELSE 'VID0'::BLOB END) || encode(text) AS payload
    FROM documents
)
SELECT asset_id, modality,
       CAST(octet_length(payload) AS INT) AS n_bytes,
       true AS magic_ok,
       CAST(greatest(octet_length(payload) // 100, 1) AS INT) AS n_frames,
       md5(lower(hex(payload))) AS checksum
FROM assets
"""


# ---------------------------------------------------------------------------
# Frame sampling (video) — index selection is exact Column math; the decode
# of selected frames stays behind the stubbed codec seam like every kernel
# here.
# ---------------------------------------------------------------------------

FRAME_RATE = 4  # synthetic fps for the deterministic metadata
SAMPLE_EVERY_S = 2.0  # sample one frame every N seconds
MAX_FRAMES = 8  # per-asset cap (bounds downstream decode fan-out)


def with_video_metadata(assets: DataFrame) -> DataFrame:
    """Attach deterministic (fps, duration_s) metadata to video assets —
    stands in for the container-header parse a real codec would do."""
    return assets.filter(F.col("modality") == "video").select(
        "asset_id",
        "n_bytes",
        F.lit(FRAME_RATE).alias("fps"),
        # duration derived from payload size: 1 second per 40 bytes, >= 1s
        F.greatest(
            (F.col("n_bytes") / 40).cast("double"), F.lit(1.0)
        ).alias("duration_s"),
    )


def sample_frame_indices(videos: DataFrame) -> DataFrame:
    """Uniform-in-time frame sampling: one frame every SAMPLE_EVERY_S
    seconds, capped at MAX_FRAMES per asset — the index plan a video
    pipeline hands to the (stubbed) decoder. Output: one row per selected
    frame (asset_id, frame_idx, t_offset_s).

    Pure Column arithmetic + explode: map-only, no shuffle; the per-asset
    cap bounds the decode fan-out so downstream Arrow batches stay sized.
    """
    n_samples = F.least(
        F.greatest(
            F.ceil(F.col("duration_s") / SAMPLE_EVERY_S).cast("int"), F.lit(1)
        ),
        F.lit(MAX_FRAMES),
    )
    idx = F.explode(F.sequence(F.lit(0), n_samples - 1)).alias("sample_no")
    return (
        videos.select("asset_id", "fps", "duration_s", idx)
        .select(
            "asset_id",
            (
                (F.col("sample_no") * SAMPLE_EVERY_S) * F.col("fps")
            ).cast("bigint").alias("frame_idx"),
            # explicit half-up floor form (repo policy: no engine round() on
            # output surfaces; values here are exact multiples of 2.0 so this
            # is belt-and-braces, mirrored in frame_sample_sql)
            (
                F.floor(F.col("sample_no") * SAMPLE_EVERY_S * 1000.0 + 0.5)
                / 1000.0
            ).alias("t_offset_s"),
        )
    )


def frame_sample_sql(source: str = "documents") -> str:
    """DuckDB twin over the same synthesized corpus: video assets are
    doc_id % 3 == 2; payload = 4-byte magic + utf-8 text."""
    return f"""
WITH videos AS (
    SELECT doc_id AS asset_id,
           4 + octet_length(encode(text)) AS n_bytes,
           {FRAME_RATE} AS fps,
           greatest(CAST(4 + octet_length(encode(text)) AS DOUBLE) / 40, 1.0)
             AS duration_s
    FROM {source} WHERE doc_id % 3 = 2
),
samples AS (
    SELECT asset_id, fps,
           unnest(generate_series(0,
               least(greatest(CAST(ceil(duration_s / {SAMPLE_EVERY_S}) AS INT),
                              1), {MAX_FRAMES}) - 1)) AS sample_no
    FROM videos
)
SELECT asset_id,
       CAST(sample_no * {SAMPLE_EVERY_S} * fps AS BIGINT) AS frame_idx,
       (floor(sample_no * {SAMPLE_EVERY_S} * 1000.0 + 0.5) / 1000.0) AS t_offset_s
FROM samples
"""
