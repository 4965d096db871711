"""Codec-seam contract: a REAL media decoder drops into
operators/multimodal.extract_features(codec=...) without any change to
the Spark plan — the seam is data-only (bytes in, metadata dict out).

Two real codecs are exercised:
- a pure-python PPM (P6) parser — always runs: it genuinely decodes the
  payload bytes (magic, dimensions, pixel count), unlike fake_decode's
  hash-derived stand-in;
- Pillow JPEG/PNG decode — skip-marked, runs wherever PIL is installed.

Both must produce the same physical plan shape as the fake codec (one
narrow mapInPandas stage, zero exchanges): the codec is a closure inside
the Arrow batch loop, invisible to Catalyst.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from proactive_map_reduce_spark.operators import multimodal as mm
from proactive_map_reduce_spark.plans import audit


def ppm_bytes(w: int, h: int) -> bytes:
    """A valid binary-PPM (P6) image: header + w*h RGB pixels."""
    return b"P6\n%d %d\n255\n" % (w, h) + b"\x7f" * (w * h * 3)


def make_ppm_decode():
    """Real codec #1: parse the P6 header and verify the pixel payload
    length — an actual decode of the bytes, not a hash of them. Built as
    a closure so cloudpickle ships it by value (the tests package is not
    importable on executors)."""

    def ppm_decode(payload: bytes, media_type: str) -> dict:
        import re as _re

        if media_type == "audio":
            return {"width": 0, "height": 0, "n_frames": 1}
        m = _re.match(rb"P6\n(\d+) (\d+)\n255\n", payload)
        if not m:
            raise ValueError("not a P6 ppm")
        w, h = int(m.group(1)), int(m.group(2))
        if len(payload) - m.end() != w * h * 3:
            raise ValueError("truncated pixel data")
        return {"width": w, "height": h, "n_frames": 1 if media_type == "image" else 2}

    return ppm_decode


def _payload_df(spark):
    rows = [
        (1, ppm_bytes(4, 3), "image"),
        (2, b"\x00riff-ish", "audio"),
        (3, ppm_bytes(2, 2), "video"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )


def _plan_shape(df) -> str:
    """Plan fingerprint with ids/addresses stripped — codec swaps must
    leave this identical."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = re.sub(r"#\d+[L]?", "#x", plan)
    plan = re.sub(r"@[0-9a-f]+", "@x", plan)
    plan = re.sub(r"\[plan_id=\d+\]", "", plan)
    return plan


def test_real_ppm_codec_drops_into_seam(spark):
    df = _payload_df(spark)
    ppm_decode = make_ppm_decode()
    out = mm.extract_features(df, codec=ppm_decode).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["width"], r["height"], r["n_frames"]) for r in out] == [
        (1, 4, 3, 1),
        (2, 0, 0, 1),
        (3, 2, 2, 2),
    ]
    # decode is real: a corrupted payload must surface as a job failure,
    # not a silent hash-metadata row
    bad = spark.createDataFrame(
        [(9, b"P6\n4 3\n255\nshort", "image")],
        "doc_id long, payload binary, media_type string",
    )
    with pytest.raises(Exception):
        mm.extract_features(bad, codec=ppm_decode).collect()


def test_codec_swap_leaves_plan_unchanged(spark):
    df = _payload_df(spark)
    shape_fake = _plan_shape(mm.extract_features(df, codec=mm.fake_decode))
    ppm_decode = make_ppm_decode()
    shape_real = _plan_shape(mm.extract_features(df, codec=ppm_decode))
    assert shape_fake == shape_real
    # and the stage stays narrow: no exchange enters the plan either way
    assert audit.count_exchanges(mm.extract_features(df, codec=ppm_decode)) == 0


def test_pillow_codec_if_available(spark):
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    def pil_decode(payload: bytes, media_type: str) -> dict:
        if media_type == "audio":
            return {"width": 0, "height": 0, "n_frames": 1}
        img = PIL_Image.open(io.BytesIO(payload))
        return {
            "width": img.width,
            "height": img.height,
            "n_frames": getattr(img, "n_frames", 1),
        }

    buf = io.BytesIO()
    PIL_Image.new("RGB", (6, 5)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, buf.getvalue(), "image")], "doc_id long, payload binary, media_type string"
    )
    out = mm.extract_features(df, codec=pil_decode).collect()
    assert (out[0]["width"], out[0]["height"]) == (6, 5)
    assert _plan_shape(mm.extract_features(df, codec=pil_decode)) == _plan_shape(
        mm.extract_features(df, codec=mm.fake_decode)
    )
