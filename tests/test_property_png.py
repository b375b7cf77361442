"""Property-based conformance for the PNG codec (r9; completes the
jar-less-codec fuzz family alongside test_property_avro's 200-example
Avro roundtrip).

Two properties:

1. **Roundtrip**: encode_png -> decode_image recovers exact pixels for
   random dims (1..40 x 1..24) and all three color types. The encoder
   cycles all five filter types by row, so any image with height >= 5
   exercises every defilter; hypothesis additionally shrinks dims to the
   1-pixel-wide edge cases where Sub/Paeth's left neighbor is always
   the zero phantom.
2. **Spec decode, not inverse-of-our-encoder**: an INDEPENDENT minimal
   encoder (filter-0 rows only, IDAT split at a random byte boundary)
   produces bytes our decoder must also read exactly — proving the
   chunk walk concatenates split IDATs and the inflate path doesn't
   depend on our encoder's framing choices.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.operators.multimodal import (
    decode_image,
    encode_png,
)

dims = st.tuples(st.integers(1, 40), st.integers(1, 24))
case = st.tuples(dims, st.sampled_from([0, 2, 6]), st.integers(0, 2**32 - 1))


def _expected_rgb(px: np.ndarray, w: int, h: int, ct: int) -> bytes:
    ch = {0: 1, 2: 3, 6: 4}[ct]
    raw = px.reshape(h, w * ch)
    if ct == 0:
        return np.repeat(raw, 3, axis=1).tobytes()
    if ct == 2:
        return raw.tobytes()
    return raw.reshape(h, w, 4)[:, :, :3].reshape(h, w * 3).tobytes()


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(case)
def test_png_roundtrip_random(params):
    (w, h), ct, seed = params
    ch = {0: 1, 2: 3, 6: 4}[ct]
    px = np.random.default_rng(seed).integers(0, 256, size=w * h * ch, dtype=np.uint8)
    w2, h2, arr = decode_image(encode_png(w, h, px.tobytes(), color_type=ct))
    assert (w2, h2) == (w, h)
    assert arr.tobytes() == _expected_rgb(px, w, h, ct)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(dims, st.integers(0, 2**32 - 1), st.integers(0, 10_000))
def test_png_decodes_independent_encoder_with_random_idat_split(wh, seed, cut):
    w, h = wh
    px = np.random.default_rng(seed).integers(0, 256, size=w * h * 3, dtype=np.uint8)
    body = b"".join(b"\x00" + px.reshape(h, w * 3)[y].tobytes() for y in range(h))
    comp = zlib.compress(body)
    split = cut % (len(comp) + 1)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", comp[:split])
        + chunk(b"IDAT", comp[split:])
        + chunk(b"IEND", b"")
    )
    w2, h2, arr = decode_image(blob)
    assert (w2, h2) == (w, h) and arr.tobytes() == px.tobytes()


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(dims, st.integers(0, 2**32 - 1), st.data())
def test_png_crc_corruption_fails_loudly(wh, seed, data):
    # ADVICE r9 #1: the chunk walk VERIFIES CRCs — flipping any byte of
    # any chunk's data (IHDR dims, IDAT stream, ...) without fixing the
    # stored CRC must raise, never decode to silently wrong pixels
    w, h = wh
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=h * w * 3, dtype=np.uint8)
    payload = bytearray(encode_png(w, h, px.tobytes(), color_type=2))
    # pick a byte inside a chunk's data region: skip magic(8) and each
    # chunk's len/type; corrupt within IHDR data (offset 16..29) or the
    # IDAT body — both must be CRC-protected
    ihdr_data = range(16, 16 + 13)
    idat_start = 16 + 13 + 4 + 8  # after IHDR chunk + IDAT len/type
    (idat_len,) = struct.unpack_from(">I", bytes(payload), 16 + 13 + 4)
    idat_data = range(idat_start, idat_start + idat_len)
    pos = data.draw(st.sampled_from(list(ihdr_data) + list(idat_data)))
    flip = data.draw(st.integers(1, 255))
    payload[pos] ^= flip
    try:
        decode_image(bytes(payload))
    except (ValueError, NotImplementedError):
        return  # loud failure — the contract
    raise AssertionError("corrupted PNG decoded without a CRC error")
