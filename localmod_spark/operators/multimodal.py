"""Multimodal columns: opaque binary payloads + typed metadata.

The reference has an image-NSFW classifier (`src/localmod/classifiers/
nsfw_image.py`) that the text pipeline doesn't use (SURVEY §7.5); a
training-data pipeline still needs the *plumbing* for image/audio/video
columns at 100 TB.  This module makes that plumbing real — schema,
deterministic synthesis, partition-friendly batching, mapInPandas UDF
signatures and batch shapes — while the actual codec work is stubbed
(PIL/ffmpeg/torchvision are not in this container):

  * ``decode="fake"`` (default): a deterministic stand-in decoder —
    byte-statistics features, so tests can assert exact values;
  * ``decode="real"``: raises NotImplementedError at the decode call
    site, marking exactly where PIL/torchvision slot in.

Scale notes: binary payloads dominate row size, so the stage keeps Arrow
batches small (`media_batch_rows`), never shuffles payload bytes (feature
extraction is a narrow map; only the small feature vectors continue), and
frame-sampling happens *inside* the UDF so sampled-out bytes never cross
the JVM↔Python boundary again.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("conv_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

_KINDS = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]


def synth_media(spark: SparkSession, n_rows: int, payload_bytes: int = 2048) -> DataFrame:
    """Deterministic opaque-binary media table (closed-form, distributed).

    Payload = the row id's MD5 digest repeated — not a real codec stream,
    but stable and unique per row, which is all the plumbing tests need.
    MD5 (rather than xxhash64) because it is engine-independent: the
    DuckDB correctness oracle recomputes the same digest bytes, so the
    byte-statistics features are cross-checkable end to end."""
    if payload_bytes % 16 != 0:
        raise ValueError("payload_bytes must be a multiple of the 16-byte digest")
    i = F.col("id")
    kind_ix = (i % 3).cast("int")
    kinds = F.array(*[F.lit(k) for k, _ in _KINDS])
    mimes = F.array(*[F.lit(m) for _, m in _KINDS])
    digest = F.md5(i.cast("string"))  # 32 hex chars = 16 payload bytes
    payload = F.unhex(F.repeat(digest, payload_bytes // 16))
    # metadata scalar derived from the digest's first 8 hex chars (< 2^32)
    h = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    return (
        spark.range(n_rows)
        .select(
            i.alias("media_id"),
            F.format_string("conv-%08d", (i % 1000).cast("int")).alias("conv_id"),
            F.element_at(kinds, kind_ix + 1).alias("kind"),
            F.element_at(mimes, kind_ix + 1).alias("mime"),
            payload.alias("payload"),
            F.when(kind_ix == 0, ((h % 640) + 64).cast("int")).alias("width"),
            F.when(kind_ix == 0, ((h % 480) + 48).cast("int")).alias("height"),
            F.when(kind_ix != 0, ((h % 60000) + 1000).cast("int")).alias("duration_ms"),
        )
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("byte_mean", DoubleType(), False),
        StructField("byte_entropy", DoubleType(), False),
        StructField("feature", ArrayType(DoubleType()), False),
        StructField("n_frames_sampled", IntegerType(), False),
    ]
)


def _fake_decode_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for decode→embed: bucketed byte histogram,
    L2-normalized.  Replace with PIL/torchvision decode + model forward."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    norm = np.linalg.norm(hist) or 1.0
    return hist / norm


def _try_import_pil():
    """Optional-import gate for the real image codec: PIL when installed
    (env-gated tests exercise the real path there), None in this
    container (the fake-codec paths and loud ``decode="real"`` errors are
    unchanged)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _pil_decode_features(Image, payload: bytes, dim: int) -> np.ndarray:
    """REAL decode → feature: PIL-decode the payload, grayscale, bucketed
    luminance histogram L2-normalized — same output contract as the fake
    path (swap the histogram for a model forward to get embeddings)."""
    import io

    img = Image.open(io.BytesIO(payload)).convert("L")
    pixels = np.asarray(img, dtype=np.uint8).reshape(-1)
    hist = np.bincount(pixels % dim, minlength=dim).astype(np.float64)
    norm = np.linalg.norm(hist) or 1.0
    return hist / norm


def extract_media_features(
    media: DataFrame,
    dim: int = 16,
    frame_sample_every_ms: int = 5000,
    decode: str = "fake",
    media_batch_rows: int = 256,
) -> DataFrame:
    """Narrow mapInPandas: payload bytes → small feature rows.

    Only (media_id, kind, payload, duration_ms) cross into Python; only
    the feature vector crosses back.  ``frame_sample_every_ms`` models
    video frame sampling: the number of 'frames' processed is
    duration/interval, computed inside the UDF.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _try_import_pil() if decode == "real" else None
        for pdf in batches:
            if decode == "real" and len(pdf) and Image is None:
                raise NotImplementedError(
                    "real decode requires PIL/torchvision/ffmpeg — not in this container; "
                    "plug the codec here (same signature, same output schema)"
                )
            # columnar iteration (zip over numpy arrays) — the per-payload
            # bincount is inherently per-row, but the row plumbing isn't
            rows = []
            kinds = pdf["kind"].to_numpy()
            durations = pdf["duration_ms"].to_numpy()
            for media_id, kind, payload, duration in zip(
                pdf["media_id"].to_numpy(), kinds, pdf["payload"], durations
            ):
                payload = bytes(payload)
                arr = np.frombuffer(payload, dtype=np.uint8)
                counts = np.bincount(arr, minlength=256).astype(np.float64)
                probs = counts[counts > 0] / len(arr)
                entropy = float(-(probs * np.log2(probs)).sum())
                if kind == "video" and not pd.isna(duration):
                    n_frames = max(int(duration) // frame_sample_every_ms, 1)
                else:
                    n_frames = 1
                if decode == "real":
                    if kind != "image":
                        raise NotImplementedError(
                            "real decode covers images (PIL); audio/video codecs "
                            "(ffmpeg) are not in this container"
                        )
                    feat = _pil_decode_features(Image, payload, dim)
                else:
                    feat = _fake_decode_features(payload, dim)
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "n_bytes": len(payload),
                        "byte_mean": float(arr.mean()),
                        "byte_entropy": round(entropy, 6),
                        "feature": feat.tolist(),
                        "n_frames_sampled": n_frames,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    slim = media.select("media_id", "kind", "payload", "duration_ms")
    # small Arrow batches: payloads are MBs at production scale
    slim = slim.repartition(max(media.sparkSession.sparkContext.defaultParallelism, 8))
    return slim.mapInPandas(_extract, schema=FEATURE_SCHEMA)


# ---------------------------------------------------- S4: input dispatch ----


def load_image_bytes(image_input, fetch_url=None) -> bytes:
    """Byte-level port of the reference's image input dispatch
    (``ImageNSFWClassifier._load_image``,
    `src/localmod/classifiers/nsfw_image.py:79-108`), stopping at raw
    bytes: the PIL decode itself stays behind the decode slot (PIL is not
    in this container), but every input KIND the reference accepts is
    discriminated here in the same order —

      * PIL-like object (has ``convert`` + ``mode``): rejected with a
        clear error — a decoded in-memory image belongs to the decode
        slot, not a byte pipeline (the reference passes it through
        because it IS the decoded form);
      * ``str``/``Path`` starting http(s)://  → fetched via the injected
        ``fetch_url`` callable (reference: ``requests.get(timeout=10)``);
        no network in this sandbox, so the default raises loudly;
      * ``data:...;base64,`` URL → decoded payload bytes (extension for
        table columns, where images commonly arrive base64-inline);
      * other ``str``/``Path`` → local file bytes;
      * ``bytes``/``bytearray`` → as-is;
      * file-like (has ``read``) → ``read()``;
      * anything else → ``ValueError`` (`nsfw_image.py:108`).
    """
    import base64
    from pathlib import Path

    if hasattr(image_input, "convert") and hasattr(image_input, "mode"):
        raise TypeError(
            "decoded PIL images are driver-side objects; pass path/URL/bytes "
            "into the Spark pipeline and decode inside the codec slot"
        )
    if isinstance(image_input, (str, Path)):
        path = str(image_input)
        if path.startswith(("http://", "https://")):
            if fetch_url is None:
                raise NotImplementedError(
                    "URL inputs need a fetch_url callable (reference uses "
                    "requests.get with timeout=10, nsfw_image.py:90-96); "
                    "no network access in this sandbox"
                )
            return fetch_url(path)
        if path.startswith("data:"):
            header, _, payload = path.partition(",")
            if not header.endswith(";base64"):
                raise ValueError(f"unsupported data URL encoding: {header}")
            return base64.b64decode(payload)
        with open(path, "rb") as f:
            return f.read()
    if isinstance(image_input, (bytes, bytearray)):
        return bytes(image_input)
    if hasattr(image_input, "read"):
        return image_input.read()
    raise ValueError(f"Unsupported image input type: {type(image_input)}")


def with_image_payload(df: DataFrame, ref_col: str = "image_ref") -> DataFrame:
    """Normalize a heterogeneous image-reference STRING column (local
    path or base64 data-URL — the forms that appear inline in transcript
    tables) to a ``payload`` binary column, via the same dispatch.

    Scale shape: narrow mapInPandas; refs resolve executor-side, so file
    reads parallelize across the cluster and the (large) payload bytes
    are born on the executor that will decode them — they never route
    through the driver."""

    def _resolve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [load_image_bytes(r) for r in pdf[ref_col]]
            yield out

    schema = StructType(list(df.schema.fields) + [StructField("payload", BinaryType(), False)])
    return df.mapInPandas(_resolve, schema=schema)


# ------------------------------------------------------------- O7: NSFW ----

NSFW_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("nsfw_prob", DoubleType(), False),
        StructField("predicted_label", StringType(), False),
        StructField("nsfw_flagged", BooleanType(), False),
        StructField("severity", StringType(), False),
    ]
)


def _fake_vit_probs(payload: bytes) -> list:
    """Deterministic stand-in for the ViT softmax over {normal, nsfw}:
    a single logit derived from the payload's byte mean, softmaxed.
    Replace with AutoImageProcessor + AutoModelForImageClassification
    (the decision layer in ``kernel/nsfw_image.py`` is the reference's
    and stays unchanged)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    z = (float(arr.mean()) - 127.5) / 16.0
    e = np.exp([-z, z])
    p = e / e.sum()
    return [float(p[0]), float(p[1])]


def classify_media_nsfw(
    media: DataFrame, threshold: float = 0.5, decode: str = "fake", model_fn=None
) -> DataFrame:
    """Image-NSFW scoring (reference O7, `src/localmod/classifiers/
    nsfw_image.py:110-182`) over the binary media table: images only,
    narrow mapInPandas (payloads never shuffle), decision math from
    ``kernel/nsfw_image.py`` verbatim.

    ``decode="fake"`` (default): the deterministic stand-in above.
    ``decode="real"``: PIL-decode each payload (env-gated — raises the
    loud slot error when PIL is absent, as in this container) and score
    the decoded pixel array with ``model_fn(np.ndarray) -> probs list``
    — the ViT processor+forward slot (inject the real
    AutoImageProcessor + AutoModelForImageClassification there; the
    label-scan/fallback decision layer is the reference's either way)."""
    from localmod_spark.kernel.nsfw_image import _severity as nsfw_severity
    from localmod_spark.kernel.nsfw_image import nsfw_image_prob

    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    if decode == "real" and model_fn is None:
        raise ValueError("decode='real' needs a model_fn (the ViT forward slot)")

    def _clf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _try_import_pil() if decode == "real" else None
        for pdf in batches:
            if decode == "real" and len(pdf) and Image is None:
                raise NotImplementedError(
                    "real decode requires PIL + transformers — not in this container; "
                    "plug processor+model here (decision layer stays as-is)"
                )
            rows = []
            for mid, payload in zip(pdf["media_id"].to_numpy(), pdf["payload"]):
                if decode == "real":
                    import io

                    img = Image.open(io.BytesIO(bytes(payload))).convert("RGB")
                    probs = model_fn(np.asarray(img))
                else:
                    probs = _fake_vit_probs(bytes(payload))
                prob, label = nsfw_image_prob(probs)  # one decision pass per row
                rows.append(
                    {
                        "media_id": mid,
                        "nsfw_prob": prob,
                        "predicted_label": label,
                        "nsfw_flagged": prob >= threshold,
                        "severity": nsfw_severity(prob, threshold),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in NSFW_IMAGE_SCHEMA.fields])

    slim = media.where(F.col("kind") == "image").select("media_id", "payload")
    return slim.mapInPandas(_clf, schema=NSFW_IMAGE_SCHEMA)
