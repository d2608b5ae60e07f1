"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a typed
metadata struct; decode / feature-extraction / frame-sampling run as
pandas-UDF batch kernels over mapInPandas, so the JVM only ever moves
opaque bytes and the Python side sees whole Arrow batches.

The real decode step needs codec libraries (PIL/ffmpeg/soundfile) that
are NOT in this container, so the codec boundary is STUBBED — clearly
marked below — behind `_decode_payload`, which either raises
NotImplementedError (`strict=True`) or produces a deterministic fake
decode derived from the payload bytes (`strict=False`, default for
tests). The fake uses the portable integer hash family from
`linkgraph.dedup.phash` (poly-hash of the payload bytes + one linear
congruence per dimension), so a SQL engine can reproduce it exactly —
that is what makes the `media_features` driver row value-checkable
against DuckDB despite the codec being stubbed. Everything around the
stub — schema, Arrow batch shape, partitioning, UDF signatures, output
contracts — is real and tested; swapping in a real codec is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from linkgraph.dedup import phash

# (a_i, b_i) congruence seeds for the 64 stub-decode dimensions —
# the same family the portable MinHash signatures use.
_STUB_SEEDS = np.array([phash.sig_seeds(i) for i in range(64)], dtype=np.int64)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

_KINDS = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]


def synthetic_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes)."""
    df = spark.range(n)
    kind_idx = (F.col("id") + seed) % 3
    kind = (
        F.when(kind_idx == 0, "image").when(kind_idx == 1, "audio").otherwise("video")
    )
    mime = (
        F.when(kind_idx == 0, "image/png")
        .when(kind_idx == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    # sha-256 (not 512): DuckDB's core sha256() lets the oracle rebuild
    # this exact payload, which is what makes media_features value-checkable.
    payload = F.sha2(F.concat(F.lit(f"media:{seed}:"), F.col("id")), 256).cast("binary")
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        F.when(kind_idx != 1, (F.col("id") % 64 + 16).cast("int")).alias("width"),
        F.when(kind_idx != 1, (F.col("id") % 48 + 16).cast("int")).alias("height"),
        F.when(kind_idx != 0, (F.col("id") % 9000 + 1000).cast("int")).alias(
            "duration_ms"
        ),
        payload.alias("payload"),
    )


# ------------------------------------------------------------- CODECS --
# Optional real codecs, import-guarded: this container has no
# image/audio libraries, so both guards resolve to None and the
# deterministic stub below takes over. Installing Pillow / soundfile
# flips the real decode on with NO other change — the decode contract
# either way is "payload bytes -> 1-D float64 signal".
try:  # pragma: no cover — not installed in this container
    from PIL import Image as _PIL_IMAGE
except Exception:
    _PIL_IMAGE = None
try:  # pragma: no cover — not installed in this container
    import soundfile as _SOUNDFILE
except Exception:
    _SOUNDFILE = None


def _decode_wav_stdlib(payload: bytes) -> np.ndarray:
    """PCM WAV decode with only the stdlib ``wave`` module + NumPy —
    the audio real-branch needs no third-party install for the WAV
    container (round-5; soundfile still handles every other format).
    Samples scale to [-1, 1) exactly like soundfile's PCM conversion;
    multi-channel stays interleaved (matches ``reshape(-1)`` above).
    Raises ``wave.Error`` on non-WAV bytes (strict mode propagates)."""
    import io as _io
    import wave as _wave

    with _wave.open(_io.BytesIO(bytes(payload))) as w:
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        return np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if width == 1:  # unsigned 8-bit per the WAV spec
        u = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        return (u - 128.0) / 128.0
    if width == 4:
        return np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    raise _wave.Error(f"unsupported PCM sample width {width}")


def _decode_real(payload: bytes, kind: str) -> np.ndarray | None:
    """Real decode when a codec is present, else None.

    Video stays stubbed even with these libs (frame demux needs
    ffmpeg/pyav); its plumbing contract is identical.
    """
    import io as _io

    if kind == "image" and _PIL_IMAGE is not None:
        img = _PIL_IMAGE.open(_io.BytesIO(bytes(payload))).convert("L")
        return np.asarray(img, dtype=np.float64).ravel() / 255.0
    if kind == "audio":
        if _SOUNDFILE is not None:
            data, _sr = _SOUNDFILE.read(_io.BytesIO(bytes(payload)))
            return np.asarray(data, dtype=np.float64).reshape(-1)
        return _decode_wav_stdlib(payload)
    return None


def _codec_available(kind: str) -> bool:
    # audio is always decodable for the WAV container via the stdlib
    # path; PCM is what the pipeline's own writers emit.
    return (kind == "image" and _PIL_IMAGE is not None) or kind == "audio"


def _decode_payload(payload: bytes, kind: str, strict: bool) -> np.ndarray:
    """Decode seam: real codec when available, else the deterministic
    STUB (bytes -> seeded float array) so the surrounding Spark plumbing
    stays testable end-to-end. strict=True refuses to fake: it raises
    NotImplementedError when no codec exists for `kind` and propagates
    real decode errors instead of falling back."""
    if _codec_available(kind):
        try:
            out = _decode_real(payload, kind)
        except Exception:
            if strict:
                raise
            out = None
        if out is not None and out.size:
            return out
    if strict:
        raise NotImplementedError(
            f"no codec library available to decode kind={kind!r}; install "
            "Pillow (image) / soundfile (audio) / pyav (video)"
        )
    # Portable deterministic fake: poly-hash the payload bytes, then one
    # phash.sig_seeds congruence per dimension, scaled to [-0.5, 0.5).
    # Exact int64 arithmetic end-to-end (a,h < P1 so a*h < 1e18 < 2^63),
    # and v -> v/P1 - 0.5 is the same two IEEE ops in any engine — the
    # DuckDB oracle in __spark_entry__ reproduces these doubles bitwise.
    h = 0
    for byte in bytes(payload):
        h = (h * 31 + byte) % phash.P1
    vals = (_STUB_SEEDS[:, 0] * h + _STUB_SEEDS[:, 1]) % phash.P1
    return vals.astype(np.float64) / float(phash.P1) - 0.5
# -----------------------------------------------------------------------


def decode_images(
    media: DataFrame, target_w: int = 32, target_h: int = 32, strict: bool = False
) -> DataFrame:
    """(media_id, pixels: array<double>) — decode + resize kernel.

    Batch shape: one Python call per Arrow batch; the resize itself is a
    vectorized reshape of the (fake-)decoded signal to target_w*target_h
    via linear interpolation — the contract a real decoder must meet.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = target_w * target_h
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for payload in pdf["payload"]:
                sig = _decode_payload(payload, "image", strict)
                xp = np.linspace(0, 1, len(sig))
                out.append(np.interp(np.linspace(0, 1, size), xp, sig))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "pixels": [o.tolist() for o in out]}
            )

    imgs = media.where(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(kernel, schema="media_id long, pixels array<double>")


def extract_features(media: DataFrame, dim: int = 64, strict: bool = False) -> DataFrame:
    """(media_id, kind, feature: array<double>) for every media row."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                _decode_payload(p, k, strict)[:dim].tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema="media_id long, kind string, feature array<double>"
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, strict: bool = False
) -> DataFrame:
    """(media_id, frame_idx, ts_ms, frame: array<double>) — frame
    sampling for video rows at a fixed stride; frame count derives from
    duration_ms, so the output cardinality is metadata-driven (plannable
    JVM-side) while frame decode stays in the batch kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for _, r in pdf.iterrows():
                n_frames = max(1, int(r["duration_ms"]) // every_ms)
                base = _decode_payload(r["payload"], "video", strict)
                for i in range(n_frames):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame"].append(np.roll(base, i).tolist())
            yield pd.DataFrame(rows)

    vids = media.where(F.col("kind") == "video").select(
        "media_id", "duration_ms", "payload"
    )
    return vids.mapInPandas(
        kernel, schema="media_id long, frame_idx int, ts_ms int, frame array<double>"
    )
