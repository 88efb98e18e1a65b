"""Multimodal (image) operators over opaque binary columns.

Images travel as `bytes: binary` with typed metadata columns (w, h,
fmt) — exactly the corpus input_hint shape. All pixel work happens in
Arrow-batched mapInPandas; the Spark plan only ever shuffles the narrow
metadata unless a stage genuinely needs pixels.

Codecs: ppm/png are REAL (numpy-only, sources/corpus.py); jpeg and
friends raise NotImplementedError per batch row (no image libs in this
environment) — the plumbing (schema, batching, partition behavior) is
identical for a real codec, so swapping one in is a pure function swap.

payload-verification (input_hint): decoded pixels must match the
reference pixels exactly for lossless fmts (allclose) / PSNR>=40dB for
lossy, and captions must be byte-equal.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..sources import corpus as C

DECODE_META_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("mean_lum", T.DoubleType()),
    T.StructField("phash", T.LongType()),
    T.StructField("decode_ok", T.BooleanType()),
])


def decode_meta(corpus: DataFrame) -> DataFrame:
    """Decode every image, recompute (w, h, mean luminance, phash).
    Unsupported codecs yield decode_ok=false rows instead of failing
    the job (poison-pill isolation — essential at 10^10 rows)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                try:
                    arr = C.decode_image(r.bytes, r.fmt)
                    rows.append((r.image_id, r.fmt, arr.shape[1], arr.shape[0],
                                 float(arr.mean()), C.phash_of(arr), True))
                except Exception:  # noqa: BLE001 — any decode failure is a False row
                    # (null bytes -> TypeError, truncated chunk header ->
                    # struct.error, unknown codec -> NotImplementedError)
                    rows.append((r.image_id, r.fmt, None, None, None, None, False))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_META_SCHEMA.fields])

    return corpus.select("image_id", "bytes", "fmt").mapInPandas(gen, DECODE_META_SCHEMA)


RAMP_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
])


def ramp_dims_of(doc_id: int) -> tuple[int, int]:
    """(w, h), both multiples of 8 (phash_of's equal-block condition),
    varied across rows so no constant-shape assumption can hide."""
    return 16 + (doc_id % 4) * 8, 8 + (doc_id % 3) * 8


def ramp_pixels_of(doc_id: int) -> "np.ndarray":
    """(h, w, 3) uint8, pixel[y,x,c] = (doc_id*7 + y*3 + x + c) % 256 —
    CLOSED-FORM arithmetic, so an ANSI-SQL oracle can regenerate every
    pixel and recompute the integer-exact phash. The value-check twin
    of the rng-based corpus images (pixels_of), feeding the SAME real
    PPM codec + phash pipeline that payload verification uses."""
    w, h = ramp_dims_of(doc_id)
    y = np.arange(h, dtype=np.int64)[:, None, None]
    x = np.arange(w, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((doc_id * 7 + y * 3 + x + c) % 256).astype(np.uint8)


def synth_ramp_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic closed-form PPM images, one per input row —
    image_id = 'i{doc_id}'. Consumed by decode_meta/resize unchanged."""
    from pyspark.sql import functions as F

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                did = int(did)
                w, h = ramp_dims_of(did)
                rows.append((f"i{did}", C.encode_ppm(ramp_pixels_of(did)),
                             "ppm", w, h))
            yield pd.DataFrame(rows, columns=[f.name for f in RAMP_SCHEMA.fields])

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(gen, RAMP_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
])


def resize(corpus: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (numpy stride sampling), re-encoded as ppm.
    The canonical thumbnailing stage of an image training pipeline.
    Undecodable rows drop with isolation (poison-pill rule)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                try:
                    arr = C.decode_image(r.bytes, r.fmt)
                except Exception:  # noqa: BLE001 — isolation, never job abort
                    continue
                yi = np.linspace(0, arr.shape[0] - 1, out_h).round().astype(int)
                xi = np.linspace(0, arr.shape[1] - 1, out_w).round().astype(int)
                small = arr[yi][:, xi]
                rows.append((r.image_id, C.encode_ppm(small), out_w, out_h, "ppm"))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return corpus.select("image_id", "bytes", "fmt").mapInPandas(gen, RESIZE_SCHEMA)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean())
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


VERIFY_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("pixels_ok", T.BooleanType()),
    T.StructField("psnr_db", T.DoubleType()),
    T.StructField("caption_ok", T.BooleanType()),
    T.StructField("phash_ok", T.BooleanType()),
])

LOSSLESS_FMTS = {"ppm", "png"}


def verify_payload(corpus: DataFrame, seed: int, n_hosts: int, total_pages: int,
                   min_psnr: float = 40.0,
                   fanout: tuple[int, int] = (3, 8)) -> DataFrame:
    """Per-row invariant vs the generator (the 'reference rows'):
    decoded pixels allclose (lossless) or PSNR>=min_psnr (lossy),
    caption byte-equality vs regeneration, phash recompute equality.
    One mapInPandas pass; returns a small boolean report table."""
    counts = C.zipf_page_counts(n_hosts, total_pages)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                try:
                    host = r.image_id.split("/", 1)[0]
                    hi = int(host.split(".")[0][1:])
                    leaf = r.image_id.rsplit("/", 1)[-1]
                    pj = 0 if leaf == "index" else int(leaf[1:])
                    arr = C.decode_image(r.bytes, r.fmt)
                    ref = C.pixels_of(seed, hi, pj, arr.shape[1], arr.shape[0])
                    p = psnr(arr, ref)
                    if r.fmt in LOSSLESS_FMTS:
                        px_ok = np.allclose(arr, ref)
                    else:
                        px_ok = p >= min_psnr
                    ph_ok = C.phash_of(arr) == r.phash
                    cap_ok = (r.caption or "") == C.caption_of(
                        seed, hi, pj, counts[hi], n_hosts, fanout)
                    rows.append((r.image_id, bool(px_ok), float(p),
                                 bool(cap_ok), bool(ph_ok)))
                except Exception:  # noqa: BLE001 — a row this op cannot even
                    # decode/parse is by definition a failed verification:
                    # report it, never abort the job (poison-pill rule)
                    rows.append((r.image_id, False, 0.0, False, False))
            yield pd.DataFrame(rows, columns=[f.name for f in VERIFY_SCHEMA.fields])

    return corpus.select("image_id", "bytes", "fmt", "caption", "phash").mapInPandas(gen, VERIFY_SCHEMA)


import pyarrow as pa  # noqa: E402
from pyspark.sql.functions import arrow_udf  # noqa: E402


@arrow_udf(T.BooleanType())
def _payload_ok_udf(data: pa.Array, fmt: pa.Array, phash: pa.Array) -> pa.Array:
    """Per-row fetch-payload invariant (input_hint): decode the image
    bytes and compare the recomputed perceptual hash against the stored
    one — the batch-engine analog of verifying a fetched body. Decode
    failures (unsupported codec, truncated bytes) are False, never
    exceptions (poison-pill isolation).

    Arrow-NATIVE (not pandas): the binary column is consumed straight
    from the Arrow data page via the offsets buffer — each row's bytes
    are a zero-copy memoryview slice into the page, never a per-row
    PyBytes allocation (an earlier pandas_udf version spent more time
    materializing an object Series of the payloads than decoding them).
    Nullable int64 phash is also exact here — the historic Arrow->pandas
    int64->float64 hash-corruption hazard is a pandas conversion
    artifact that arrow_udf sidesteps entirely."""
    n = len(data)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return pa.array(out)
    if isinstance(data, pa.ChunkedArray):  # defensive; scalar UDFs get Arrays
        data = data.combine_chunks()
    null_d = data.is_null().to_numpy(zero_copy_only=False)
    null_p = phash.is_null().to_numpy(zero_copy_only=False)
    offw = 8 if pa.types.is_large_binary(data.type) else 4
    odt = np.int64 if offw == 8 else np.int32
    bufs = data.buffers()
    offs = np.frombuffer(bufs[1], dtype=odt, count=n + 1, offset=data.offset * offw)
    mv = memoryview(bufs[2])
    fmts = fmt.to_pylist()
    phs = phash.to_pylist()
    for i in range(n):
        if null_d[i] or null_p[i]:
            continue
        try:
            arr = C.decode_image(mv[offs[i]:offs[i + 1]], fmts[i])
            out[i] = C.phash_of(arr) == phs[i]
        except Exception:  # noqa: BLE001 — any decode failure is a False row
            pass
    return pa.array(out)


# nondeterministic mark: stops Catalyst substituting the UDF into pushed
# filters (same double-evaluation hazard as canonical_outlink_udf)
payload_ok_udf = _payload_ok_udf.asNondeterministic()
