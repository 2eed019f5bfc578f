"""Dependency-free REAL image codecs for the multimodal seam.

The multimodal plumbing (`ops/multimodal.py`) routes decode through a
codec registry so production can install PIL/ffmpeg wrappers. This
module proves that seam with an actual decoder that needs no external
library: pure-stdlib header parsers for the three container formats a
web-scale image corpus is overwhelmingly made of — PNG (ISO/IEC 15948
§5.3/§11.2.2: IHDR is the first chunk after the 8-byte signature),
JPEG/JFIF (ITU-T T.81 §B.2.2: frame header SOFn carries precision,
height, width, component count), and GIF (GIF89a spec: logical screen
descriptor immediately follows the 6-byte signature, little-endian).

These read ONLY the header bytes — O(1) per payload regardless of image
size, which is exactly the cheap-metadata pass you want executor-side at
100 TB before deciding whether a full pixel decode (the expensive,
library-backed step) is worth scheduling. `image_header_decoder()`
plugs into `set_decoder("image", ...)` so `extract_features` runs real
bytes end-to-end in this container; a production deploy swaps in a
pixel decoder with the same one-line `set_decoder` call.

Reference parity note: the reference validates structured records only
(`/root/reference/app/organism_validation.py`); the multimodal column
family is part of the training-pipeline surface this engine adds on
top, so there is no reference file to cite for these semantics — the
cited authorities are the public container-format specifications above.
"""

from __future__ import annotations

import struct
from typing import Any

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: PNG color type → number of channels (spec §11.2.2 table)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: JPEG SOFn markers that carry a frame header. 0xC4 (DHT), 0xC8 (JPG
#: extension) and 0xCC (DAC) live in the same numeric range but are NOT
#: frame headers — skipping them wrong is the classic parser bug.
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}

#: stable numeric ids for the feature vector
FORMAT_IDS = {"png": 1, "jpeg": 2, "gif": 3}


def parse_png_header(payload: bytes) -> dict[str, Any] | None:
    """IHDR fields of a PNG, or None if the bytes are not a valid PNG
    header. Needs the first 29 bytes only (signature + IHDR length/type
    + 13-byte IHDR data)."""
    if payload is None or len(payload) < 29:
        return None
    if payload[:8] != PNG_SIGNATURE:
        return None
    length, ctype = struct.unpack(">I4s", payload[8:16])
    if ctype != b"IHDR" or length != 13:
        return None
    width, height, bit_depth, color_type = struct.unpack(
        ">IIBB", payload[16:26]
    )
    if width == 0 or height == 0:
        return None
    return {
        "format": "png",
        "width": int(width),
        "height": int(height),
        "bit_depth": int(bit_depth),
        "channels": _PNG_CHANNELS.get(color_type, 0),
    }


def parse_jpeg_header(payload: bytes) -> dict[str, Any] | None:
    """Walk JPEG marker segments to the first SOFn frame header. Bounded
    scan: each non-frame segment is skipped by its declared length, so
    the loop touches metadata segments only, never entropy-coded data."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None  # lost marker sync — corrupt header
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            pos += 1
            continue
        if marker == 0xD9:
            # EOI before any SOF: no frame header exists. EOI is
            # standalone — reading a "length" after it would walk into
            # whatever bytes follow the stream (corrupt/truncated files)
            # and could fabricate dimensions from garbage.
            return None
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF_MARKERS:
            if pos + 4 + 6 > n:
                return None
            bit_depth, height, width, n_comp = struct.unpack(
                ">BHHB", payload[pos + 4 : pos + 10]
            )
            if width == 0 or height == 0:
                return None
            return {
                "format": "jpeg",
                "width": int(width),
                "height": int(height),
                "bit_depth": int(bit_depth),
                "channels": int(n_comp),
            }
        pos += 2 + seg_len
    return None


def parse_gif_header(payload: bytes) -> dict[str, Any] | None:
    """Logical screen descriptor of a GIF87a/GIF89a (little-endian)."""
    if payload is None or len(payload) < 13:
        return None
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width, height = struct.unpack("<HH", payload[6:10])
    if width == 0 or height == 0:
        return None
    packed = payload[10]
    # color resolution field = bits-per-primary - 1 (spec §18)
    bit_depth = ((packed >> 4) & 0x7) + 1
    return {
        "format": "gif",
        "width": int(width),
        "height": int(height),
        "bit_depth": int(bit_depth),
        "channels": 3,  # palette entries are RGB triples
    }


def parse_image_header(payload: bytes) -> dict[str, Any] | None:
    """Sniff + parse: PNG, then JPEG, then GIF. O(header) per payload."""
    return (
        parse_png_header(payload)
        or parse_jpeg_header(payload)
        or parse_gif_header(payload)
    )


def image_header_decoder(n_features: int = 8):
    """A REAL decoder for ``set_decoder("image", ...)``: features are
    the parsed header fields — (format_id, width, height, bit_depth,
    channels, n_bytes, aspect_ratio, megapixels), padded/truncated to
    ``n_features``. Unparseable payloads yield all-zero features rather
    than failing the batch: at corpus scale a corrupt header is a datum
    (feature[0] == 0 → filter it downstream), not a job-killer."""

    def decode(payload: bytes, meta: dict[str, Any]) -> list[float]:
        hdr = parse_image_header(payload) if payload else None
        if hdr is None:
            return [0.0] * n_features
        w, h = hdr["width"], hdr["height"]
        feats = [
            float(FORMAT_IDS[hdr["format"]]),
            float(w),
            float(h),
            float(hdr["bit_depth"]),
            float(hdr["channels"]),
            float(len(payload)),
            float(w) / float(h),
            float(w) * float(h) / 1e6,
        ]
        return (feats + [0.0] * n_features)[:n_features]

    return decode


def make_test_png(width: int, height: int, *, gray: int = 128) -> bytes:
    """A VALID single-color 8-bit grayscale PNG built with stdlib zlib —
    real bytes for tests/benches, no image library. (CRCs are computed
    properly; any external PNG reader accepts the output.)"""
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes([gray]) * width for _ in range(height))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_test_jpeg(width: int, height: int) -> bytes:
    """A minimal JPEG header stream (SOI, APP0/JFIF, SOF0, EOI) — enough
    real T.81 structure to exercise the marker walk; not a full
    entropy-coded image (tests the header path, which is all this
    decoder reads)."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        struct.pack(">BHHB", 8, height, width, 3)
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"
    )


def make_test_gif(width: int, height: int) -> bytes:
    """A minimal GIF89a header (signature + logical screen descriptor +
    trailer)."""
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([0x70, 0, 0])  # packed: 8-bit color resolution, no GCT
        + b"\x3b"
    )


# --- MP4 / ISO BMFF container probe (the VIDEO seam's real codec) ----
#
# ISO/IEC 14496-12 (ISO base media file format): a file is a sequence
# of boxes [size u32][type 4cc][payload]; size==1 switches to a u64
# largesize after the type, size==0 means "to end of file". The movie
# header box `moov/mvhd` carries the presentation timescale (units per
# second) and duration (in those units) — everything a frame sampler
# needs to place timestamps without decoding a single pixel.


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    buf[start:end]; stops (never raises) on truncated/corrupt sizes —
    corpus-scale parsing treats a bad container as a datum."""
    off = start
    while off + 8 <= end:
        size = struct.unpack(">I", buf[off : off + 4])[0]
        btype = buf[off + 4 : off + 8]
        payload_off = off + 8
        if size == 1:
            if off + 16 > end:
                return
            size = struct.unpack(">Q", buf[off + 8 : off + 16])[0]
            payload_off = off + 16
        elif size == 0:
            size = end - off
        if size < payload_off - off or off + size > end:
            return
        yield btype, payload_off, off + size
        off += size


def parse_mp4_header(payload: bytes) -> dict[str, Any] | None:
    """``{format, brand, timescale, duration, duration_ms}`` from an
    ISO BMFF (MP4/MOV) container's ``ftyp`` + ``moov/mvhd`` boxes, or
    None when the bytes are not a parseable container. Reads box
    headers only — O(box count), never the media data — the same
    cheap-metadata contract as the image header parsers. Handles both
    mvhd version 0 (32-bit times) and version 1 (64-bit)."""
    if payload is None or len(payload) < 16:
        return None
    brand = None
    mvhd: tuple[int, int] | None = None
    saw_box = False
    for btype, p0, p1 in _iter_boxes(payload, 0, len(payload)):
        saw_box = True
        if btype == b"ftyp" and p1 - p0 >= 4:
            brand = payload[p0 : p0 + 4].decode("latin-1").strip()
        elif btype == b"moov":
            for ctype, c0, c1 in _iter_boxes(payload, p0, p1):
                if ctype != b"mvhd":
                    continue
                version = payload[c0]
                if version == 0 and c1 - c0 >= 20 + 4:
                    timescale, duration = struct.unpack(
                        ">II", payload[c0 + 12 : c0 + 20]
                    )
                elif version == 1 and c1 - c0 >= 28 + 4:
                    timescale = struct.unpack(
                        ">I", payload[c0 + 20 : c0 + 24]
                    )[0]
                    duration = struct.unpack(
                        ">Q", payload[c0 + 24 : c0 + 32]
                    )[0]
                else:
                    continue
                mvhd = (timescale, duration)
    # require BOTH a recognized brand box and a movie header: arbitrary
    # bytes can accidentally parse as one box, but not as this pair
    if not saw_box or brand is None or mvhd is None or mvhd[0] == 0:
        return None
    timescale, duration = mvhd
    return {
        "format": "mp4",
        "brand": brand,
        "timescale": timescale,
        "duration": duration,
        "duration_ms": int(duration * 1000 // timescale),
    }


def _mp4_mdat_span(payload: bytes) -> tuple[int, int] | None:
    """(start, end) of the first ``mdat`` box's media bytes, or None."""
    for btype, p0, p1 in _iter_boxes(payload, 0, len(payload)):
        if btype == b"mdat":
            return p0, p1
    return None


def mp4_frame_sampler():
    """A REAL container-probing sampler for
    ``set_frame_sampler("video", ...)``: the frame TIMELINE comes from
    the container itself (``moov/mvhd`` timescale/duration — never from
    side-channel meta), and frame payloads are successive spans of the
    actual ``mdat`` media data. Pixel DECODE of those spans still needs
    ffmpeg/pyav (not in this container) — the sampler proves the video
    seam the way the header codecs prove the image seam: real bytes in,
    real container structure parsed, deterministic frames out.
    Unparseable containers yield zero frames (a corrupt video is a
    datum, not a job-killer)."""

    def sample(
        payload: bytes, meta: dict[str, Any], every_ms: int
    ) -> list[tuple[int, bytes]]:
        hdr = parse_mp4_header(payload) if payload else None
        if hdr is None or hdr["duration_ms"] <= 0:
            return []
        span = _mp4_mdat_span(payload)
        media = payload[span[0] : span[1]] if span else b""
        n_frames = max(hdr["duration_ms"] // max(every_ms, 1), 1)
        chunk = max(len(media) // n_frames, 1) if media else 1
        out = []
        for i in range(n_frames):
            frame = bytes(media[i * chunk : (i + 1) * chunk])
            if frame:
                out.append((i * every_ms, frame))
        return out

    return sample


def make_test_mp4(
    duration_ms: int,
    *,
    timescale: int = 1000,
    media: bytes = b"",
    mvhd_version: int = 0,
) -> bytes:
    """A minimal VALID ISO BMFF container (ftyp + moov/mvhd + mdat) —
    real box structure for tests; any MP4 box walker accepts it."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + btype + payload

    duration = duration_ms * timescale // 1000
    if mvhd_version == 0:
        mvhd = box(
            b"mvhd",
            b"\x00\x00\x00\x00"  # version 0 + flags
            + struct.pack(">II", 0, 0)  # ctime, mtime
            + struct.pack(">II", timescale, duration)
            + b"\x00" * 80,  # rate..next_track_ID (fixed defaults)
        )
    else:
        mvhd = box(
            b"mvhd",
            b"\x01\x00\x00\x00"
            + struct.pack(">QQ", 0, 0)
            + struct.pack(">I", timescale)
            + struct.pack(">Q", duration)
            + b"\x00" * 80,
        )
    return (
        box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
        + box(b"moov", mvhd)
        + box(b"mdat", media)
    )
