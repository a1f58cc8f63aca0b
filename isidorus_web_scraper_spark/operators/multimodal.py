"""Multimodal columns: image/audio/video as opaque binary + metadata.

The reference's media path downloads image bytes, stores them in S3
under a job-scoped key, and LLM-explains them
(`workers/image_extractor/services/extractor_service.go:55-129`,
`workers/image_explainer/services/explainer_service.py:28-83`). Here
media payloads are opaque ``binary`` columns with typed metadata; the
Spark-side plumbing — schema, Arrow batch shape, partition spread — is
real and tested, while the actual codec step is stubbed (no image/audio
libs in this container): ``decode_features`` raises
NotImplementedError for real codecs and offers a deterministic fake
for tests/pipelines.

All per-row logic is Arrow-batched (mapInPandas); payload bytes never
pass through row-at-a-time Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),      # image|audio|video
        T.StructField("ext", T.StringType(), False),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

_CONTENT_TYPES = {
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "mp3": "audio/mpeg",
    "wav": "audio/wav",
    "mp4": "video/mp4",
}

_KINDS = {"png": "image", "jpg": "image", "jpeg": "image", "gif": "image",
          "mp3": "audio", "wav": "audio", "mp4": "video"}


def ext_col(ref: F.Column | str) -> F.Column:
    """P9 extension inference: URL-suffix regex, ≤5 alnum chars, query
    stripped (`extractor_service.go:109-129`); 'bin' fallback."""
    c = F.col(ref) if isinstance(ref, str) else ref
    return F.coalesce(
        F.nullif(
            F.regexp_extract(c, r"\.([A-Za-z0-9]{1,5})(?:\?|$)", 1), F.lit("")
        ),
        F.lit("bin"),
    )


def fake_payload(ref: str, size: int = 256) -> bytes:
    """Deterministic stand-in for downloaded bytes (no network): a
    sha256-keyed stream, same ref ⇒ same bytes on any executor."""
    seed = hashlib.sha256(ref.encode()).digest()
    reps = -(-size // len(seed))
    return (seed * reps)[:size]


def media_table(refs: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """refs(media_ref) → opaque payload + typed metadata. The download
    (S3 fetch / HTTP GET with 10s timeout, http_repository.go:22-40) is
    simulated with deterministic bytes."""
    ext = ext_col(ref_col)
    # bind everything the closure needs as LOCALS so cloudpickle ships
    # it by value — Python workers must not need this package on their
    # import path (the external driver may launch from any cwd)
    kinds, ctypes = dict(_KINDS), dict(_CONTENT_TYPES)

    def fill(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def payload_of(r: str, size: int = 256) -> bytes:
            seed = hashlib.sha256(r.encode()).digest()
            return (seed * (-(-size // len(seed))))[:size]

        for pdf in batches:
            payload = pdf[ref_col].map(payload_of)
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "kind": pdf["ext"].map(lambda e: kinds.get(e, "binary")),
                    "ext": pdf["ext"],
                    "content_type": pdf["ext"].map(ctypes.get),
                    "payload": payload,
                    "n_bytes": payload.map(len),
                }
            )

    return (
        refs.select(F.col(ref_col), ext.alias("ext"))
        .mapInPandas(fill, MEDIA_SCHEMA)
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def decode_features(
    media: DataFrame,
    mode: str = "fake",
    feature_dim: int = 8,
    frame_sample: int = 4,
) -> DataFrame:
    """Decode / feature-extract / resize / frame-sample over binary
    payloads via mapInPandas.

    mode='real' needs image/audio codecs (PIL/av) that are not in this
    container — it raises NotImplementedError at plan-build time so the
    failure is immediate, not mid-job. mode='fake' derives deterministic
    features from the payload bytes (byte-histogram moments), with the
    exact batch shape a real decoder would use.
    """
    if mode == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real media decoding needs PIL/av, not available here; "
                "use mode='fake' for the deterministic stand-in"
            ) from e

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats, ws, hs, nf = [], [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if payload is None:
                    feats.append(None)
                    ws.append(None)
                    hs.append(None)
                    nf.append(None)
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                # byte-histogram moment features — the fake "embedding"
                chunks = np.array_split(arr, feature_dim)
                feats.append([float(c.mean()) / 255.0 for c in chunks])
                ws.append(int(arr[0]) + 1 if kind == "image" else None)
                hs.append(int(arr[1]) + 1 if kind == "image" else None)
                nf.append(frame_sample if kind == "video" else None)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "features": feats,
                    "width": ws,
                    "height": hs,
                    "n_frames": nf,
                }
            )

    return media.select(
        "media_ref", "kind", "payload"
    ).mapInPandas(decode, FEATURES_SCHEMA)


def data_url_col(payload: F.Column | str, content_type: F.Column | str) -> F.Column:
    """F7: base64 data-URL for LLM image prompts
    (`workers/image_explainer/services/explainer_service.py:64-65`)."""
    p = F.col(payload) if isinstance(payload, str) else payload
    ct = F.col(content_type) if isinstance(content_type, str) else content_type
    return F.concat(
        F.lit("data:"),
        F.coalesce(ct, F.lit("application/octet-stream")),
        F.lit(";base64,"),
        F.base64(p),
    )
