"""Audio/video binary-column operators: container round-trips, chunked
feature extraction, frame sampling, poison-pill isolation, and the
bridge from video frames into the image pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from urlmap_spark.operators import av as AV


@pytest.fixture(scope="module")
def ids(spark):
    return spark.createDataFrame([(i,) for i in range(12)], "doc_id long")


def test_audio_container_roundtrip():
    s = AV.audio_samples_of(5)
    rate, back = AV.decode_audio(AV.encode_rawa(s, 16000), "rawa")
    assert rate == 16000
    assert np.array_equal(s, back)
    with pytest.raises(NotImplementedError):
        AV.decode_audio(b"whatever", "mp3")
    with pytest.raises(ValueError):
        AV.decode_audio(b"JUNKxxxxxxxx", "rawa")


def test_audio_chunk_features_match_direct(spark, ids):
    got = {(r["doc_id"], r["chunk_idx"]): (r["n"], r["sum_abs"], r["peak"])
           for r in AV.audio_chunk_features(AV.synth_audio(ids), chunk=512).collect()}
    want = {}
    for did in range(12):
        ab = np.abs(AV.audio_samples_of(did).astype(np.int64))
        for ci in range(0, len(ab), 512):
            w = ab[ci:ci + 512]
            want[(did, ci // 512)] = (len(w), int(w.sum()), int(w.max()))
    assert got == want


def test_audio_poison_pill_isolated(spark):
    """A row with an undecodable codec drops; the rest of the batch
    still produces features (the per-row isolation rule)."""
    av = spark.createDataFrame(
        [(0, AV.encode_rawa(AV.audio_samples_of(0), 8000), "rawa"),
         (1, b"\xff\xfbencoded-mp3-junk", "mp3"),
         (2, b"RAWAtruncated", "rawa"),
         (3, None, "rawa"),           # null payload -> TypeError class
         (4, b"RAWAxx", "rawa")],     # header shorter than 12 -> struct.error
        "doc_id long, bytes binary, fmt string")
    out = AV.audio_chunk_features(av, chunk=512).select("doc_id").distinct().collect()
    assert {r["doc_id"] for r in out} == {0}


def test_video_poison_pill_isolated(spark):
    """Same isolation classes on the video path, for both consumers
    (frame_sample features and frame_extract stills)."""
    good = AV.encode_rawv(AV.video_frames_of(0))
    av = spark.createDataFrame(
        [(0, good, "rawv"),
         (1, None, "rawv"),            # null payload
         (2, b"RAWVxx", "rawv"),       # truncated header -> struct.error
         (3, b"JUNKxxxxxxxxxx", "rawv"),  # bad magic -> ValueError
         (4, b"h264-junk-bytes", "h264")],  # stubbed codec
        "doc_id long, bytes binary, fmt string")
    sampled = AV.frame_sample(av).select("doc_id").distinct().collect()
    assert {r["doc_id"] for r in sampled} == {0}
    stills = AV.frame_extract(av).select("image_id").collect()
    assert all(r["image_id"].startswith("v0/") for r in stills) and stills


def test_video_container_roundtrip():
    fr = AV.video_frames_of(7)
    back = AV.decode_video(AV.encode_rawv(fr), "rawv")
    assert np.array_equal(fr, back)
    assert fr.shape == (AV.video_dims_of(7)[2], AV.video_dims_of(7)[1],
                        AV.video_dims_of(7)[0])
    with pytest.raises(NotImplementedError):
        AV.decode_video(b"whatever", "h264")


def test_frame_sample_every_k(spark, ids):
    out = AV.frame_sample(AV.synth_video(ids), every=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did in range(12):
        w, h, nf = AV.video_dims_of(did)
        rows = sorted(by_doc[did], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == list(range(0, nf, 3))
        fr = AV.video_frames_of(did)
        for r in rows:
            assert (r["w"], r["h"], r["n_px"]) == (w, h, w * h)
            assert r["sum_lum"] == int(fr[r["frame_idx"]].sum(dtype=np.int64))


def test_frame_extract_feeds_image_pipeline(spark, ids):
    """Sampled frames re-encode as PPM and decode through the image
    path (multimodal.decode_meta) with consistent luminance."""
    from urlmap_spark.operators.multimodal import decode_meta

    frames = AV.frame_extract(AV.synth_video(ids.filter(F.col("doc_id") < 3)), every=4)
    meta = decode_meta(frames).collect()
    assert all(r["decode_ok"] for r in meta)
    by_id = {r["image_id"]: r for r in meta}
    for did in range(3):
        w, h, nf = AV.video_dims_of(did)
        fr = AV.video_frames_of(did)
        for fi in range(0, nf, 4):
            m = by_id[f"v{did}/f{fi}"]
            assert (m["w"], m["h"]) == (w, h)
            assert abs(m["mean_lum"] - fr[fi].mean()) < 1e-9
