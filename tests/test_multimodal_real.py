"""Real PIL decode/resize path (round-3 verdict #6): green when PIL is
installed, clean skip when it isn't (this sandbox ships no image libs).

The stubs in operators/multimodal.py stay the no-deps default; these tests
pin the contract the real path must honor the day the container gains PIL:
true pixel dimensions, per-row quarantine of undecodable bytes, and
'no_decoder' (not a crash) for kinds that need ffmpeg.
"""

from __future__ import annotations

import pytest

PIL = pytest.importorskip("PIL")

from pyspark.sql import functions as F  # noqa: E402

from webscraper_spark.operators.multimodal import decode_features, resize_plan  # noqa: E402


def _png_bytes(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), rgb).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def real_media(spark):
    rows = [
        (0, "image", _png_bytes(48, 32, (255, 0, 0)), None),
        (1, "image", _png_bytes(16, 16, (0, 128, 255)), None),
        (2, "image", b"not an image at all", None),  # quarantine, not crash
        (3, "audio", b"\x00" * 64, None),  # needs ffmpeg -> no_decoder
        (4, "image", None, None),  # null payload path
    ]
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta map<string,string>"
    )


def test_real_decode_dimensions_and_quarantine(real_media):
    got = {r.media_id: r for r in decode_features(real_media, require_real_decoder=True).collect()}
    assert (got[0].width, got[0].height, got[0].status) == (48, 32, "ok")
    assert (got[1].width, got[1].height, got[1].status) == (16, 16, "ok")
    # solid-red image: mean R ~1.0, G/B ~0.0, stds ~0.0
    f = got[0].feat
    assert f[0] > 0.99 and f[1] < 0.01 and f[2] < 0.01 and max(f[3:6]) < 0.01
    assert got[2].status == "decode_error"
    assert got[3].status == "no_decoder"
    assert got[4].status == "null_payload"
    # deterministic: same bytes -> same features
    again = {r.media_id: r.feat for r in decode_features(real_media, require_real_decoder=True).collect()}
    assert again[0] == got[0].feat and again[1] == got[1].feat


def test_real_resize_roundtrip(real_media, spark):
    got = {r.media_id: r for r in resize_plan(real_media, 8, 8, require_real_resizer=True).collect()}
    assert (got[0].width, got[0].height, got[0].status) == (8, 8, "ok")
    assert got[0].n_bytes > 0
    assert got[2].status == "decode_error"
    assert got[3].status == "no_decoder"
    assert got[4].status == "null_payload"
    # resized output is a real 8x8 image: decode it back through PIL
    import hashlib
    import io

    from PIL import Image

    src = _png_bytes(48, 32, (255, 0, 0))
    img = Image.open(io.BytesIO(src)).convert("RGB").resize((8, 8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    digest = hashlib.sha256(buf.getvalue()).hexdigest()
    assert got[0].resized_h60 == int(digest[:15], 16)
    assert got[0].n_bytes == len(buf.getvalue())
