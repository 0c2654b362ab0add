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


# ---------------------------------------------------------------------------
# REAL codecs, dependency-free (stdlib wave / zlib): prove the DECODERS seam
# with genuinely decoded byte streams. WAV: 16-bit PCM. PNG: 8-bit grayscale,
# all five standard scanline filters on decode (encoder emits filter 0).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float64 [-1, 1) mono -> RIFF/WAVE 16-bit PCM bytes (stdlib wave)."""
    import io
    import wave as _wave
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        pcm = np.clip(np.asarray(samples, dtype=np.float64) * 32768.0,
                      -32768, 32767).astype("<i2")
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAVE 16-bit PCM -> float64 in [-1, 1); channels averaged."""
    import io
    import wave as _wave
    with _wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        ch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    a = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if ch > 1:
        a = a.reshape(-1, ch).mean(axis=1)
    return a


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 grayscale HxW -> PNG bytes (filter 0 scanlines, one IDAT)."""
    import struct
    import zlib
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG (8-bit grayscale, non-interlaced) -> int64 HxW. Handles all five
    standard scanline filters (None/Sub/Up/Average/Paeth), so real-world
    grayscale PNGs decode too, not just this module's encoder output."""
    import struct
    import zlib
    payload = bytes(payload)
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG byte stream")
    pos, idat = 8, b""
    w = h = bitdepth = color = inter = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bitdepth, color, _comp, _filt, inter = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if bitdepth != 8 or color != 0 or inter != 0:
        raise ValueError("only 8-bit grayscale non-interlaced PNG supported")
    raw = zlib.decompress(idat)
    stride = w + 1
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int64)
    for r in range(h):
        ft = raw[r * stride]
        line = np.frombuffer(raw[r * stride + 1:(r + 1) * stride],
                             dtype=np.uint8).astype(np.int64)
        if ft == 0:            # None
            cur = line
        elif ft == 2:          # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:          # Sub
            cur = line
            for i in range(1, w):
                cur[i] = (cur[i] + cur[i - 1]) & 0xFF
        elif ft == 3:          # Average
            cur = line
            cur[0] = (cur[0] + prev[0] // 2) & 0xFF
            for i in range(1, w):
                cur[i] = (cur[i] + (cur[i - 1] + prev[i]) // 2) & 0xFF
        elif ft == 4:          # Paeth
            cur = line
            for i in range(w):
                a = cur[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out.astype(np.int64)


REAL_DECODERS = {"image": decode_png, "audio": decode_wav}


def synth_real_media(docs_media: DataFrame) -> DataFrame:
    """Like :func:`synth_media` but the payloads are GENUINE encoded byte
    streams (PNG for images, WAV for audio) with deterministic content
    derived from media_ref — built in one mapInPandas (corpus synthesis,
    not a query hot path). Decoding these through REAL_DECODERS exercises
    actual codec work end-to-end."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, span_idx, media_ref in zip(
                    pdf["doc_id"].to_numpy(), pdf["span_idx"].to_numpy(),
                    pdf["media_ref"].to_numpy()):
                seed = payload_seed(media_ref.encode("utf-8"))
                if int(span_idx) % 2 == 0:
                    kind = "image"
                    r = np.arange(32).reshape(-1, 1)
                    c = np.arange(32).reshape(1, -1)
                    img = ((seed % 251) + r * 31 + c * 17) % 256
                    payload = encode_png(img.astype(np.uint8))
                    codec = "png"
                else:
                    kind = "audio"
                    i = np.arange(1024, dtype=np.int64)
                    samples = (((seed % 1000003) + i * 7919) % 65536) / 32768.0 - 1.0
                    payload = encode_wav(samples)
                    codec = "wav"
                rows.append({"doc_id": doc_id, "span_idx": int(span_idx),
                             "media_ref": media_ref, "kind": kind,
                             "payload": payload,
                             "meta": {"codec": codec, "origin": media_ref}})
            yield pd.DataFrame(rows, columns=["doc_id", "span_idx", "media_ref",
                                              "kind", "payload", "meta"])

    return docs_media.select("doc_id",
                             F.col("span_idx").cast("int").alias("span_idx"),
                             "media_ref").mapInPandas(run, MEDIA_SCHEMA)


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


def extract_features(media: DataFrame, dim: int = FEATURE_DIM,
                     decoders: dict | None = None) -> DataFrame:
    """decode -> feature-extract per media row, one mapInPandas stage.

    Features: mean/std pooled histogram slices of the decoded array —
    deterministic with the fake decoder, identical plumbing with a real one
    (pass ``decoders=REAL_DECODERS`` to decode genuine PNG/WAV byte
    streams; the plan is identical either way — tested).
    Output: (doc_id, span_idx, media_ref, kind, feature: array<double>)."""
    decoders = DECODERS if decoders is None else decoders

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, span_idx, media_ref, kind, payload in zip(
                    pdf["doc_id"].to_numpy(), pdf["span_idx"].to_numpy(),
                    pdf["media_ref"].to_numpy(), pdf["kind"].to_numpy(),
                    pdf["payload"].to_numpy()):
                dec = decoders[kind](bytes(payload))
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


def resize_images(media: DataFrame, h: int, w: int,
                  decoders: dict | None = None) -> DataFrame:
    """decode -> resize (nearest) -> re-encode raw; images only. Audio rows
    pass through a frame-sample instead (1 in 4 samples) — one fused stage
    for the whole modality-mixed table."""
    decoders = DECODERS if decoders is None else decoders

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geotrellis_contrib_spark.operators.pixels import k_resample_nearest
        for pdf in batches:
            outs = []
            for kind, payload in zip(pdf["kind"].to_numpy(), pdf["payload"].to_numpy()):
                dec = decoders[kind](bytes(payload))
                if kind == "image":
                    out = k_resample_nearest(dec, h, w)
                else:  # frame/sample decimation
                    out = dec[::4]
                outs.append(out.astype(np.float64).tobytes())
            yield pdf.assign(payload=outs)

    return media.mapInPandas(run, media.schema)
