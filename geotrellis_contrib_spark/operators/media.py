"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The engine treats media payloads exactly like raster tiles: opaque bytes
moved through Arrow into numpy inside ``mapInPandas``, never touched by
row-at-a-time Python. The decode step is STUBBED — image/audio codecs are not
in this container — behind ``DECODERS``: the default is a deterministic fake
(arithmetic pixels from the payload hash) so the Spark-side plumbing (schema,
batching, partitioning, UDF signatures) is real and tested; swapping in a
real decoder (PIL/ffmpeg) is a one-line registry change per modality and
changes no plans.

Media rows reference documents by (doc_id, span_idx) — the spans array
itself is never rewritten (span-sequence invariant).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geotrellis_contrib_spark.functions.text import FP_BASE, FP_MOD

MEDIA_SCHEMA = ("doc_id string, span_idx int, media_ref string, kind string, "
                "payload binary, meta map<string,string>")

FEATURE_DIM = 16


def payload_seed(payload: bytes) -> int:
    """Deterministic seed from the OPAQUE payload bytes: the engine-owned
    polynomial byte hash (mod 1e9+7) — the same arithmetic the text
    fingerprints use, so a SQL oracle can recompute the decode end-to-end
    from the identical bytes."""
    acc = 0
    for b in payload or b"\x00":
        acc = (acc * FP_BASE + b) % FP_MOD
    return acc


def _fake_decode_image(payload: bytes, h: int = 32, w: int = 32) -> np.ndarray:
    """Deterministic stand-in decoder: pixels derived from a payload hash.
    REPLACE with a real codec on a cluster:
        DECODERS["image"] = lambda b: np.asarray(PIL.Image.open(io.BytesIO(b)))
    """
    seed = payload_seed(payload)
    r = np.arange(h, dtype=np.int64).reshape(-1, 1)
    c = np.arange(w, dtype=np.int64).reshape(1, -1)
    return ((seed % 251) + r * 31 + c * 17).astype(np.int64) % 256


def _fake_decode_audio(payload: bytes, n: int = 1024) -> np.ndarray:
    seed = payload_seed(payload)
    i = np.arange(n, dtype=np.int64)
    return (((seed % 1000003) + i * 7919) % 65536).astype(np.float64) / 32768.0 - 1.0


DECODERS = {"image": _fake_decode_image, "audio": _fake_decode_audio}


def synth_media(docs_media: DataFrame) -> DataFrame:
    """Attach deterministic binary payloads + metadata to a media side-table
    (doc_id, span_idx, media_ref) — the corpus stand-in for blob storage."""
    kind = F.when(F.col("span_idx") % 2 == 0, "image").otherwise("audio")
    payload = F.sha2(F.col("media_ref"), 256).cast("binary")
    meta = F.create_map(F.lit("codec"), F.lit("fake"),
                        F.lit("origin"), F.col("media_ref"))
    return docs_media.select("doc_id", F.col("span_idx").cast("int").alias("span_idx"),
                             "media_ref", kind.alias("kind"),
                             payload.alias("payload"), meta.alias("meta"))


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """decode -> feature-extract per media row, one mapInPandas stage.

    Features: mean/std pooled histogram slices of the decoded array —
    deterministic with the fake decoder, identical plumbing with a real one.
    Output: (doc_id, span_idx, media_ref, kind, feature: array<double>)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, span_idx, media_ref, kind, payload in zip(
                    pdf["doc_id"].to_numpy(), pdf["span_idx"].to_numpy(),
                    pdf["media_ref"].to_numpy(), pdf["kind"].to_numpy(),
                    pdf["payload"].to_numpy()):
                dec = DECODERS[kind](bytes(payload))
                flat = dec.astype(np.float64).ravel()
                chunks = np.array_split(flat, dim)
                rows.append({"doc_id": doc_id, "span_idx": int(span_idx),
                             "media_ref": media_ref, "kind": kind,
                             "feature": [float(c.mean()) for c in chunks]})
            yield pd.DataFrame(rows, columns=["doc_id", "span_idx", "media_ref",
                                              "kind", "feature"])

    return media.mapInPandas(
        run, "doc_id string, span_idx int, media_ref string, kind string, "
             "feature array<double>")


def resize_images(media: DataFrame, h: int, w: int) -> DataFrame:
    """decode -> resize (nearest) -> re-encode raw; images only. Audio rows
    pass through a frame-sample instead (1 in 4 samples) — one fused stage
    for the whole modality-mixed table."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geotrellis_contrib_spark.operators.pixels import k_resample_nearest
        for pdf in batches:
            outs = []
            for kind, payload in zip(pdf["kind"].to_numpy(), pdf["payload"].to_numpy()):
                dec = DECODERS[kind](bytes(payload))
                if kind == "image":
                    out = k_resample_nearest(dec, h, w)
                else:  # frame/sample decimation
                    out = dec[::4]
                outs.append(out.astype(np.float64).tobytes())
            yield pdf.assign(payload=outs)

    return media.mapInPandas(run, media.schema)
