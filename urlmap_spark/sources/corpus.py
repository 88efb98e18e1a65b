"""Deterministic web-as-a-table corpus generator (seed-stable, no network).

Per BASELINE input_hint, the "web" is a table of image+caption pairs:

    corpus(image_id string, bytes binary, w int, h int, fmt string,
           caption string, phash bigint, url string, status int)

``url`` / ``status`` are derived convenience columns (url is a pure
function of image_id; status models the reference's 200/3xx/4xx/5xx
fetch outcomes, reference: internal/crawler/crawler.go:331-334).

The caption IS the "HTML": outlinks are embedded as href="..." tokens in
document order, mirroring the reference's a[href] extraction
(reference: internal/parser/parser.go:148). Everything is a pure
function of (seed, host_index, page_index) via blake2b hashing — the
same row can be generated independently on any executor, in pandas on
the driver (tests/oracle), or distributed via mapInPandas (bench scale),
with bit-identical results.

Graph shape: H hosts with Zipf-distributed page counts (hot hosts for
skew/salting tests); per-page outlinks mix absolute same-host links,
relative hrefs (./x, ../x, bare, ?query), cross-host links, skip-scheme
hrefs (javascript:/mailto:/...), dead links (-> fetch misses), and
malformed edge hrefs — the same families as the reference's HTML
fixtures (reference: internal/parser/fixtures_test.go:13-228,
test/shared/testutils.go:58-115).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

CORPUS_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "url", "status"]


def _h64(*parts: object) -> int:
    """Deterministic 64-bit hash of the given parts (stable across runs)."""
    b = hashlib.blake2b("\x1f".join(str(p) for p in parts).encode(), digest_size=8)
    return int.from_bytes(b.digest(), "big")


def host_name(seed: int, hi: int) -> str:
    return f"h{hi}.example-{seed}.test"


def zipf_page_counts(n_hosts: int, total_pages: int, s: float = 1.2) -> list[int]:
    """Deterministic Zipf(s) allocation of pages to hosts (host 0 hottest)."""
    w = np.arange(1, n_hosts + 1, dtype=np.float64) ** (-s)
    w /= w.sum()
    counts = np.maximum(1, np.floor(w * total_pages).astype(np.int64))
    # distribute the remainder to the hottest hosts
    i = 0
    while counts.sum() < total_pages:
        counts[i % n_hosts] += 1
        i += 1
    return counts.tolist()


def page_path(seed: int, hi: int, pj: int) -> str:
    """Deterministic path; pages share directory levels so that relative
    ../ and ./ resolution is exercised. Page 0 is the host root."""
    if pj == 0:
        return "/"
    d = _h64(seed, "dir", hi, pj) % 4
    if d == 0:
        return f"/p{pj}"
    return f"/d{d}/p{pj}"


def page_url(seed: int, hi: int, pj: int) -> str:
    return f"https://{host_name(seed, hi)}{page_path(seed, hi, pj)}"


def image_id_of(seed: int, hi: int, pj: int) -> str:
    p = page_path(seed, hi, pj)
    return f"{host_name(seed, hi)}{'/index' if p == '/' else p}"


def page_status(seed: int, hi: int, pj: int, error_rate: float = 0.08) -> int:
    """~92% 200s, with 301/404/500 sprinkled in deterministically
    (reference keeps failed URLs in output: crawler.go:215)."""
    r = _h64(seed, "status", hi, pj) % 1000
    if r < int(error_rate * 500):
        return 404
    if r < int(error_rate * 1000):
        return 500
    if r < int(error_rate * 1000) + 30:
        return 301  # still inside the reference's 200<=s<400 OK window
    return 200


def outlink_hrefs(seed: int, hi: int, pj: int, n_pages: int, n_hosts: int,
                  fanout: tuple[int, int] = (3, 8)) -> list[str]:
    """Raw hrefs for page (hi, pj), in document order. Mixes the
    reference-fixture href families; deterministic."""
    k = fanout[0] + _h64(seed, "fanout", hi, pj) % (fanout[1] - fanout[0] + 1)
    hrefs: list[str] = []
    for t in range(k):
        r = _h64(seed, "link", hi, pj, t)
        target = r % n_pages
        kind = (r >> 32) % 100
        tpath = page_path(seed, hi, target)
        if kind < 40:  # absolute same-host
            hrefs.append(f"https://{host_name(seed, hi)}{tpath}")
        elif kind < 55:  # root-relative
            hrefs.append(tpath)
        elif kind < 63:  # ./ relative within dir
            hrefs.append("./" + tpath.rsplit("/", 1)[-1] if tpath != "/" else "./")
        elif kind < 68:  # ../ relative
            hrefs.append("../" + tpath.lstrip("/"))
        elif kind < 74:  # query / fragment variants (normalize to same or new URL)
            hrefs.append(tpath + ("#frag" if kind % 2 else "?q=1"))
        elif kind < 82:  # cross-host (filtered by same-domain scope)
            other = (hi + 1 + (r >> 40) % max(1, n_hosts - 1)) % n_hosts
            hrefs.append(f"https://{host_name(seed, other)}{page_path(seed, other, target % 7)}")
        elif kind < 90:  # skip-scheme / junk hrefs (dropped by the kernel)
            junk = ["javascript:void(0)", "mailto:a@b.test", "#top", "  ", "tel:+123",
                    "data:text/plain,x", "ftp://x.test/a", "file:///etc/hosts"]
            hrefs.append(junk[(r >> 48) % len(junk)])
        else:  # dead link on same host (fetch miss -> failed result)
            hrefs.append(f"/dead/m{(r >> 16) % 1000}")
    return hrefs


def caption_of(seed: int, hi: int, pj: int, n_pages: int, n_hosts: int,
               fanout: tuple[int, int] = (3, 8)) -> str:
    """Caption = filler words + embedded href="..." tokens in doc order."""
    words = ["amber", "basalt", "cedar", "dune", "ember", "fjord", "grove", "heron"]
    r = _h64(seed, "cap", hi, pj)
    filler = " ".join(words[(r >> (4 * i)) % len(words)] for i in range(4))
    links = " ".join(f'href="{h}"' for h in outlink_hrefs(seed, hi, pj, n_pages, n_hosts, fanout))
    return f"{filler} {links} :: img {image_id_of(seed, hi, pj)}"


# --- image payload (numpy-only; PPM = lossless, decodable without Pillow) --


def pixels_of(seed: int, hi: int, pj: int, w: int, h: int) -> np.ndarray:
    rng = np.random.default_rng(_h64(seed, "px", hi, pj))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(data) -> np.ndarray:
    """Accepts bytes OR any buffer (memoryview over an Arrow data page):
    only the <=64-byte header is ever copied; the pixel block is a
    zero-copy np.frombuffer view."""
    head = bytes(data[:64])
    if not head.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    i1 = head.index(b"\n")
    i2 = head.index(b"\n", i1 + 1)
    i3 = head.index(b"\n", i2 + 1)
    w, h = (int(x) for x in head[i1 + 1:i2].split())
    return np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i3 + 1) \
             .reshape(h, w, 3)


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal zlib-deflate PNG (lossless, numpy-only encoder)."""
    h, w, _ = arr.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(data) -> np.ndarray:
    """Decoder for the no-filter RGB8 PNGs produced by encode_png.
    Accepts bytes or any buffer; chunk payloads are consumed as views."""
    if bytes(data[:4]) != b"\x89PNG":
        raise ValueError("not a PNG")
    pos, idat, w, h = 8, b"", 0, 0
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = bytes(data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", payload[:8])
        elif tag == b"IDAT":
            idat += bytes(payload)
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    # one frombuffer + slice instead of a per-scanline Python loop
    a = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    return a[:, 1:].reshape(h, w, 3)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "png":
        return decode_png(data)
    # jpeg et al: no codec in this sandbox — plumbing is real, codec stubbed
    raise NotImplementedError(f"no {fmt} codec in this environment")


def phash_of(arr: np.ndarray) -> int:
    """64-bit average-hash of the pixel array (signed int64 for Spark).

    Integer-exact and vectorized: bit(i,j) = 8x8-block pixel sum vs the
    global pixel sum, compared by cross-multiplication (block*n >
    total*cnt) — no float rounding anywhere, so generator and verifier
    agree bit-for-bit on any platform. Two np.add.reduceat calls replace
    the 64 per-block slice means of the naive version (the fetch-verify
    hot path runs this per image). Corpus dims are multiples of 8, so
    blocks are equal-sized and this equals the classic average-hash."""
    s = arr.sum(axis=2, dtype=np.int64)
    gh, gw = s.shape
    ys = np.linspace(0, gh, 9, dtype=int)
    xs = np.linspace(0, gw, 9, dtype=int)
    blocks = np.add.reduceat(np.add.reduceat(s, ys[:-1], axis=0), xs[:-1], axis=1)
    cnt = np.outer(np.diff(ys), np.diff(xs)).astype(np.int64)
    bits = (blocks * (gh * gw) > int(s.sum()) * cnt).flatten()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v


# --- row assembly -----------------------------------------------------------


def corpus_row(seed: int, hi: int, pj: int, n_pages: int, n_hosts: int,
               with_bytes: bool = True, fanout: tuple[int, int] = (3, 8)) -> dict:
    r = _h64(seed, "dims", hi, pj)
    w = (32, 48, 64)[r % 3]
    h = (32, 48, 64)[(r >> 8) % 3]
    fmt = "ppm" if (r >> 16) % 2 else "png"
    if with_bytes:
        px = pixels_of(seed, hi, pj, w, h)
        data = encode_ppm(px) if fmt == "ppm" else encode_png(px)
        ph = phash_of(px)
    else:
        data, ph = None, _h64(seed, "ph", hi, pj) - (1 << 63)
    return {
        "image_id": image_id_of(seed, hi, pj),
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption_of(seed, hi, pj, n_pages, n_hosts, fanout),
        "phash": ph,
        "url": page_url(seed, hi, pj),
        "status": page_status(seed, hi, pj),
    }


def host_page_index(seed: int, n_hosts: int, total_pages: int) -> list[tuple[int, int, int]]:
    """[(host_idx, page_idx, pages_on_host)] for the whole corpus."""
    counts = zipf_page_counts(n_hosts, total_pages)
    out = []
    for hi, c in enumerate(counts):
        out.extend((hi, pj, c) for pj in range(c))
    return out


def corpus_pandas(seed: int = 42, n_hosts: int = 4, total_pages: int = 60,
                  with_bytes: bool = True) -> pd.DataFrame:
    """Small-scale corpus as a pandas frame (tests / the oracle BFS)."""
    rows = [
        corpus_row(seed, hi, pj, n_pages, n_hosts, with_bytes)
        for hi, pj, n_pages in host_page_index(seed, n_hosts, total_pages)
    ]
    return pd.DataFrame(rows, columns=CORPUS_COLUMNS)


def corpus_spark(spark, seed: int = 42, n_hosts: int = 4, total_pages: int = 60,
                 with_bytes: bool = True, partitions: int | None = None,
                 fanout: tuple[int, int] = (3, 8)):
    """Distributed corpus generation: spark.range over (host,page) pairs ->
    mapInPandas generating rows executor-side. Scales to bench size without
    materializing anything on the driver."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("status", T.IntegerType()),
    ])
    index = host_page_index(seed, n_hosts, total_pages)
    idx_df = spark.createDataFrame(
        [(hi, pj, n) for hi, pj, n in index], "hi int, pj int, n_pages int"
    )
    if partitions:
        idx_df = idx_df.repartition(partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                corpus_row(seed, int(r.hi), int(r.pj), int(r.n_pages), n_hosts, with_bytes, fanout)
                for r in b.itertuples()
            ]
            yield pd.DataFrame(rows, columns=CORPUS_COLUMNS)

    return idx_df.mapInPandas(gen, schema=schema)


# --- canned site graphs for crawl tests (reference test/shared/testutils.go) --


def basic_site_pandas() -> pd.DataFrame:
    """4-page site mirroring the reference's basic test server
    (reference: test/shared/testutils.go:58-115): / -> /page1,/page2,
    /nested/deep; back-links to /."""
    host = "basic.test"

    def row(path, hrefs, status=200):
        iid = f"{host}{'/index' if path == '/' else path}"
        caption = " ".join(f'href="{h}"' for h in hrefs)
        return {
            "image_id": iid, "bytes": None, "w": 32, "h": 32, "fmt": "ppm",
            "caption": caption, "phash": 0,
            "url": f"https://{host}{path}", "status": status,
        }

    rows = [
        row("/", ["/page1", "/page2", "/nested/deep"]),
        row("/page1", ["/", "/page2"]),
        row("/page2", ["/", "/page1", "https://external.test/away"]),
        row("/nested/deep", ["/", "javascript:void(0)", "mailto:x@y.test"]),
    ]
    return pd.DataFrame(rows, columns=CORPUS_COLUMNS)


def nested_depth_site_pandas(levels: int = 3, fanout: int = 2) -> pd.DataFrame:
    """Strict tree: / -> /l1/pX -> /l2/pX -> ... for depth-limit goldens
    (reference: internal/crawler/comprehensive_test.go:552-616)."""
    host = "nested.test"
    rows = []

    def add(path, children, status=200):
        iid = f"{host}{'/index' if path == '/' else path}"
        rows.append({
            "image_id": iid, "bytes": None, "w": 32, "h": 32, "fmt": "ppm",
            "caption": " ".join(f'href="{c}"' for c in children), "phash": 0,
            "url": f"https://{host}{path}", "status": status,
        })

    def build(path, level, tag):
        if level > levels:
            add(path, [])
            return
        kids = [f"/l{level}/{tag}p{i}" for i in range(fanout)]
        add(path, kids)
        for i, k in enumerate(kids):
            build(k, level + 1, f"{tag}p{i}_")

    build("/", 1, "")
    return pd.DataFrame(rows, columns=CORPUS_COLUMNS)
