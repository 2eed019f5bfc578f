"""Real-bytes proof of the multimodal codec seam: a dependency-free
PNG/JPEG/GIF header decoder installed via the same ``set_decoder``
registry production uses, exercised over ACTUAL image bytes through the
Spark ``extract_features`` plan (VERDICT r3 item 6)."""

from __future__ import annotations

import pytest

from faang_pydantics_validation_spark.ops import codecs as cx
from faang_pydantics_validation_spark.ops import multimodal as mm


def test_png_header_roundtrip():
    png = cx.make_test_png(320, 200)
    hdr = cx.parse_png_header(png)
    assert hdr == {
        "format": "png", "width": 320, "height": 200,
        "bit_depth": 8, "channels": 1,
    }
    # the generated PNG is a VALID file end-to-end, not just a header:
    # decompress the IDAT stream and check the raw scanline length
    import struct
    import zlib

    idat_len = struct.unpack(">I", png[33:37])[0]
    raw = zlib.decompress(png[41 : 41 + idat_len])
    assert len(raw) == 200 * (1 + 320)  # filter byte + 1 gray byte/px


def test_jpeg_header_walks_past_app_segments():
    jpg = cx.make_test_jpeg(640, 480)
    hdr = cx.parse_jpeg_header(jpg)
    assert hdr == {
        "format": "jpeg", "width": 640, "height": 480,
        "bit_depth": 8, "channels": 3,
    }


def test_gif_header():
    hdr = cx.parse_gif_header(cx.make_test_gif(17, 23))
    assert hdr["format"] == "gif"
    assert (hdr["width"], hdr["height"]) == (17, 23)


@pytest.mark.parametrize(
    "junk",
    [None, b"", b"\x89PNG", b"\xff\xd8\x00\x00", b"not an image" * 4],
)
def test_corrupt_headers_return_none(junk):
    assert cx.parse_image_header(junk) is None


def test_jpeg_skips_dht_like_markers():
    # 0xC4 (DHT) sits inside the SOF numeric range but is NOT a frame
    # header; a parser that treats it as SOF reads garbage dimensions
    import struct

    dht = b"\xff\xc4" + struct.pack(">H", 6) + b"\x00\x01\x02\x03"
    sof = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 10, 20, 1)
        + b"\x01\x11\x00"
    )
    hdr = cx.parse_jpeg_header(b"\xff\xd8" + dht + sof + b"\xff\xd9")
    assert (hdr["width"], hdr["height"]) == (20, 10)


def test_jpeg_eoi_before_sof_is_corrupt_not_fabricated():
    """A truncated stream hitting EOI before any frame header must
    return None. EOI is standalone: a parser that reads a 'length'
    after it walks into trailing garbage and can land on an FF C0 pair,
    fabricating dimensions from a corrupt payload."""
    import struct

    # EOI immediately, then garbage engineered so a length-read at EOI
    # (\x00\x08 = skip 8) lands exactly on a fake SOF with "dimensions"
    fake_sof = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 99, 77, 3)
        + b"\x01\x11\x00"
    )
    # "length" \x00\x08 means skip 8 bytes: next marker read lands at
    # offset 2+2+8 = 12, exactly where the fake SOF begins
    garbage = b"\x00\x08" + b"\xde\xad\xbe\xef\xca\xfe"
    payload = b"\xff\xd8" + b"\xff\xd9" + garbage + fake_sof
    assert cx.parse_jpeg_header(payload) is None


def test_extract_features_decodes_real_image_bytes(spark):
    """The production seam, end to end: real PNG/JPEG/GIF bytes in a
    binary column, the header decoder installed through set_decoder,
    features out of the Arrow-batched mapInPandas plan."""
    payloads = [
        ("p1", cx.make_test_png(320, 200)),
        ("p2", cx.make_test_jpeg(640, 480)),
        ("p3", cx.make_test_gif(17, 23)),
        ("p4", b"corrupt payload"),
    ]
    df = spark.createDataFrame(
        [(sid, "image", body, None) for sid, body in payloads],
        schema=mm.MEDIA_SCHEMA,
    )
    mm.set_decoder("image", cx.image_header_decoder())
    try:
        rows = {r.sample_id: r for r in mm.extract_features(df).collect()}
    finally:
        mm._DECODERS.pop("image", None)

    assert rows["p1"].feature[:3] == [1.0, 320.0, 200.0]  # png, w, h
    assert rows["p2"].feature[:3] == [2.0, 640.0, 480.0]  # jpeg
    assert rows["p3"].feature[:3] == [3.0, 17.0, 23.0]  # gif
    assert rows["p4"].feature == [0.0] * 8  # corrupt → zero features
    # the no-mutation invariant still holds alongside the decode
    import hashlib

    assert rows["p1"].payload_sha256 == hashlib.sha256(
        payloads[0][1]
    ).hexdigest()
