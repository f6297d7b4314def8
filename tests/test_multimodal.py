"""Multimodal codec layer: the stdlib PNG encoder/decoder pair
(real bytes, all five scanline filters, CRC-verified) and the
image_stats Arrow kernel over generated PNG blobs."""

from __future__ import annotations

import numpy as np
import pytest

from graphragdatapipeline_spark.multimodal.blob import (
    decode_media,
    decode_png,
    encode_png,
)


def test_png_roundtrip_all_shapes_and_filters():
    rng = np.random.default_rng(7)
    # ≥5 rows exercises every filter type (encoder cycles y % 5)
    for shape in [(8, 6, 3), (11, 13, 3), (1, 1, 1), (5, 2, 4), (7, 9)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(arr))
        ref = arr if arr.ndim == 3 else arr[:, :, None]
        assert out.shape == ref.shape
        assert (out == ref).all(), shape


def test_png_structure_and_gates():
    arr = np.zeros((6, 4, 3), np.uint8)
    png = encode_png(arr)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # corrupted CRC must be detected, not silently decoded
    bad = bytearray(png)
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    # unsupported features are honestly gated
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # palette
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_decode_media_dispatches_png():
    arr = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    out = decode_media(encode_png(arr), "image/png")
    assert (out == arr).all()
    assert decode_media(b"hi", "text/plain") == "hi"
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "video/mp4")


def test_image_stats_kernel_over_generated_blobs(spark, sf_dir):
    """End-to-end: documents → real PNG blobs → decode → exact stats
    matching the closed-form pixel rule (k + x + 7y + 13c) % 256."""
    from pyspark.sql import functions as F

    from graphragdatapipeline_spark.io import read_table
    from graphragdatapipeline_spark.multimodal.blob import (
        image_stats,
        png_blob_table,
    )

    d = read_table(spark, sf_dir, "documents").limit(40)
    stats = image_stats(png_blob_table(d)).collect()
    assert len(stats) == 40
    for r in stats:
        k = int(r.blob_id.removeprefix("doc-"))
        w, h = 4 + k % 13, 3 + k % 11
        assert (r.width, r.height, r.channels) == (w, h, 3)
        expected = sum(
            (k + x + 7 * y + 13 * c) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        assert r.pixel_sum == expected, r


def test_wav_roundtrip_and_gates():
    import numpy as np
    import pytest

    from graphragdatapipeline_spark.multimodal.blob import (
        decode_media,
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32768, size=777, dtype=np.int16)
    wav = encode_wav(samples, sample_rate=16000)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    rate, out = decode_wav(wav)
    assert rate == 16000 and (out == samples).all()
    rate2, out2 = decode_media(wav, "audio/wav")[0], decode_media(wav, "audio/wav")[1]
    assert rate2 == 16000 and (out2 == samples).all()
    # stereo gate: honest NotImplementedError, not silent garbage
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00\x00\x00")
    with pytest.raises(NotImplementedError):
        decode_wav(buf.getvalue())


def test_resize_png_half_pixels():
    import numpy as np

    from graphragdatapipeline_spark.multimodal.blob import (
        decode_png,
        encode_png,
        resize_png_half,
    )

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(7, 9, 3), dtype=np.uint8)
    out = decode_png(resize_png_half(encode_png(arr)))
    assert out.shape == (4, 5, 3)  # ceil-halved
    assert (out == arr[::2, ::2, :]).all()
