"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference extracts PNGs from PDFs, hashes them, and manifests them
(``image_processor.py:29-153,204-227``, S9). The Spark-side plumbing is
real — schemas, batch iteration, partitioning, manifest aggregation — and
pixel decode is real for the dominant web formats plus scanned-book
masters, all pure-Python from public specs: PNG (``png_codec.py``),
baseline JPEG (``jpeg_codec.py``), GIF (``gif_codec.py``), baseline
TIFF (``tiff_codec.py``). ``decode_image_real`` dispatches on signature
and only needs PIL for anything else (WebP/...). The default
``decode_fn`` remains the
deterministic fake so fixture-driven queries stay library-independent;
pass ``decode_image_real`` to run on real pixels.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("image_index", T.IntegerType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def fake_decode(payload: bytes) -> dict:
    """Deterministic FAKE decode (stub): derives pseudo width/height/format
    and an 8-dim feature purely from the byte content. Replace with a real
    decoder where PIL/ffmpeg exist; the Spark plumbing is identical."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    fmt = ["png", "jpeg", "webp"][digest[2] % 3]
    feature = [
        (int.from_bytes(digest[4 * i : 4 * i + 4], "little") % 1000) / 1000.0
        for i in range(8)
    ]
    return dict(width=width, height=height, format=fmt, feature=feature)


def decode_image_real(payload: bytes) -> dict:
    """Real decode path: PNGs and baseline JPEGs decode pure-Python
    (multimodal/png_codec, multimodal/jpeg_codec — real pixels, real
    features, no PIL needed); other formats go through PIL when installed,
    else raise. Corrupt/out-of-subset bytes raise ValueError —
    extract_image_features isolates that per row."""
    from .png_codec import PNG_SIGNATURE, image_features, png_to_pixels

    if payload[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
        px = png_to_pixels(payload)
        return dict(
            width=int(px.shape[1]),
            height=int(px.shape[0]),
            format="png",
            feature=image_features(px),
        )
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        from .jpeg_codec import jpeg_to_pixels

        px = jpeg_to_pixels(payload)
        return dict(
            width=int(px.shape[1]),
            height=int(px.shape[0]),
            format="jpeg",
            feature=image_features(px),
        )
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif_codec import gif_to_pixels

        px = gif_to_pixels(payload)
        return dict(
            width=int(px.shape[1]),
            height=int(px.shape[0]),
            format="gif",
            feature=image_features(px),
        )
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff_codec import tiff_to_pixels

        px = tiff_to_pixels(payload)
        return dict(
            width=int(px.shape[1]),
            height=int(px.shape[0]),
            format="tiff",
            feature=image_features(px),
        )
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp_codec import webp_to_pixels

        px = webp_to_pixels(payload)  # lossless VP8L; lossy -> ValueError
        return dict(
            width=int(px.shape[1]),
            height=int(px.shape[0]),
            format="webp",
            feature=image_features(px),
        )
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError as ex:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "WebP/other decode requires PIL; PNG, baseline JPEG, GIF and "
            "baseline TIFF decode pure-Python"
        ) from ex
    img = Image.open(io.BytesIO(payload))
    return dict(
        width=img.width, height=img.height, format=(img.format or "").lower(), feature=None
    )


def extract_image_features(
    images: DataFrame,
    payload_col: str = "payload",
    doc_col: str = "doc_id",
    index_col: str = "image_index",
    decode_fn: Optional[Callable[[bytes], dict]] = None,
) -> DataFrame:
    """mapInPandas over binary payloads -> typed metadata + feature vector.

    Batch shape: one Arrow batch of (doc_id, image_index, payload) in,
    one batch of IMAGE_META_SCHEMA out. Per-row try/except — a corrupt blob
    yields null metadata, never a task failure."""
    decode = decode_fn or fake_decode

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, idx, payload in zip(
                pdf[doc_col], pdf[index_col], pdf[payload_col]
            ):
                payload = bytes(payload) if payload is not None else b""
                base = dict(
                    doc_id=int(doc_id),
                    image_index=int(idx),
                    sha256=hashlib.sha256(payload).hexdigest(),
                    n_bytes=len(payload),
                )
                try:
                    base.update(decode(payload))
                except Exception:
                    base.update(width=None, height=None, format=None, feature=None)
                rows.append(base)
            yield pd.DataFrame(rows)

    return images.mapInPandas(op, IMAGE_META_SCHEMA)


def image_manifest(meta: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """S9 manifest (ref image_processor.py:204-227): per-doc image inventory.
    hashes capped at 5 like the reference's image_hashes[:5]
    (vector_db.py:273-275)."""
    return meta.groupBy(doc_col).agg(
        F.count("*").alias("n_images"),
        F.sum("n_bytes").alias("total_bytes"),
        F.slice(F.sort_array(F.collect_list("sha256")), 1, 5).alias("image_hashes"),
    )


def write_image_files(
    images: DataFrame,
    out_dir: str,
    payload_col: str = "payload",
    doc_col: str = "doc_id",
    ext: str = "png",
) -> DataFrame:
    """S9 write side (ref image_processor.py:29-76 ``extract_and_store_images``
    writes each picture as ``{sha256(png_bytes)}.png``): content-addressed
    per-image binary files plus the manifest frame.

    One pass over the payloads: a ``mapInPandas`` stage writes each blob
    executor-side (no driver funnel) AND yields its metadata row, so the
    manifest aggregation downstream triggers the writes — payload bytes are
    scanned exactly once. The filename IS the content hash, so concurrent,
    duplicate, or retried writes are idempotent (tmp-file + atomic rename).
    ``out_dir`` must be storage all executors can reach (a local dir on
    local[*], shared/object storage on a cluster).

    Returns the per-document manifest DataFrame; materializing it performs
    the writes."""
    import hashlib as _hashlib
    import os

    meta_schema = T.StructType(
        [
            T.StructField(doc_col, images.schema[doc_col].dataType, True),
            T.StructField("sha256", T.StringType(), True),
            T.StructField("n_bytes", T.LongType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            shas, sizes = [], []
            for payload in pdf[payload_col]:
                data = bytes(payload) if payload is not None else b""
                sha = _hashlib.sha256(data).hexdigest()
                path = os.path.join(out_dir, f"{sha}.{ext}")
                # empty payloads are written too: every sha the manifest
                # records must resolve to a real file
                if not os.path.exists(path):  # content-addressed: idempotent
                    tmp = f"{path}.tmp-{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(data)
                    os.replace(tmp, path)  # atomic publish
                shas.append(sha)
                sizes.append(len(data))
            yield pd.DataFrame(
                {doc_col: pdf[doc_col], "sha256": shas, "n_bytes": sizes}
            )

    meta = images.select(doc_col, payload_col).mapInPandas(op, meta_schema)
    return meta.groupBy(doc_col).agg(
        F.count("*").alias("n_images"),
        F.sum("n_bytes").alias("total_bytes"),
        F.slice(F.sort_array(F.collect_list("sha256")), 1, 5).alias("image_hashes"),
    )
