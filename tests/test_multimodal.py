"""Multimodal plumbing: the stdlib image-header codec (VERDICT r3 #5)
and the Arrow-batched feature extraction that carries it.

The payloads are synthesized byte-exact headers (no image libraries in
this container — which is the point: header metadata needs none).
"""

from __future__ import annotations

import pandas as pd
import pytest

from twitter_to_sqlite_spark.functions import multimodal as M


def png_bytes(w: int, h: int) -> bytes:
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
    return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + ihdr + b"\x00\x00\x00\x00")


def gif_bytes(w: int, h: int) -> bytes:
    return (b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + b"\xf7\x00\x00")


def jpeg_bytes(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big")
            + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def bmp_bytes(w: int, h: int) -> bytes:
    header = b"BM" + b"\x00" * 16
    return (header + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True) + b"\x00" * 4)


@pytest.mark.parametrize("maker,w,h", [
    (png_bytes, 640, 480),
    (gif_bytes, 320, 200),
    (jpeg_bytes, 1920, 1080),
    (bmp_bytes, 800, 600),
])
def test_probe_dimensions(maker, w, h):
    assert M.probe_image_dimensions(maker(w, h)) == (w, h)


def test_probe_rejects_garbage():
    assert M.probe_image_dimensions(None) is None
    assert M.probe_image_dimensions(b"") is None
    assert M.probe_image_dimensions(b"plain text payload") is None
    # truncated PNG signature without a full IHDR
    assert M.probe_image_dimensions(b"\x89PNG\r\n\x1a\n") is None
    # a negative BMP height (top-down rows) must surface as positive
    assert M.probe_image_dimensions(
        b"BM" + b"\x00" * 16
        + (64).to_bytes(4, "little")
        + (-48).to_bytes(4, "little", signed=True) + b"\x00" * 4
    ) == (64, 48)


def test_extract_features_real_codec(spark):
    rows = [
        (1, png_bytes(12, 34)),
        (2, gif_bytes(56, 78)),
        (3, jpeg_bytes(90, 12)),
        (4, b"not an image at all"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           M.extract_features(media, use_real_codec=True).collect()}
    assert (out[1]["width"], out[1]["height"]) == (12, 34)
    assert (out[2]["width"], out[2]["height"]) == (56, 78)
    assert (out[3]["width"], out[3]["height"]) == (90, 12)
    assert out[4]["width"] is None and out[4]["height"] is None
    # the deterministic byte features still ride along
    assert out[4]["n_bytes"] == len(b"not an image at all")
    # and the default path keeps its original schema (oracle parity)
    default_cols = M.extract_features(media).columns
    assert default_cols == ["media_id", "n_bytes", "first_byte", "byte_checksum"]


def _wav(rate=16000, ch=2, bits=16, n_samples=16000):
    import struct

    byte_rate = rate * ch * bits // 8
    data = b"\x00" * (n_samples * ch * bits // 8)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate,
                      ch * bits // 8, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _aiff(rate=44100, ch=1, frames=44100):
    import struct

    # 80-bit extended: rate = mant * 2^(exp-16383-63)
    exp = 16383 + 63
    mant = rate
    while mant < (1 << 63):
        mant <<= 1
        exp -= 1
    comm = struct.pack(">hLh", ch, frames, 16) \
        + struct.pack(">HQ", exp, mant)
    body = b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
    return b"FORM" + struct.pack(">I", len(body)) + body


def _flac(rate=48000, ch=2, total=96000):
    si = bytearray(34)
    si[10] = (rate >> 12) & 0xFF
    si[11] = (rate >> 4) & 0xFF
    si[12] = ((rate & 0x0F) << 4) | (((ch - 1) & 0x07) << 1)
    si[13] = (total >> 32) & 0x0F
    si[14:18] = ((total & 0xFFFFFFFF)).to_bytes(4, "big")
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(si)


def test_probe_audio_meta_wav_aiff_flac():
    from twitter_to_sqlite_spark.functions import multimodal as M

    # 1 second of 16 kHz stereo 16-bit -> 1000 ms
    assert M.probe_audio_meta(_wav()) == (16000, 2, 1000)
    # 1 second of 44.1 kHz mono
    assert M.probe_audio_meta(_aiff()) == (44100, 1, 1000)
    # 2 seconds of 48 kHz stereo
    assert M.probe_audio_meta(_flac()) == (48000, 2, 2000)
    assert M.probe_audio_meta(None) is None
    assert M.probe_audio_meta(b"not audio") is None
    assert M.probe_audio_meta(b"RIFF\x00\x00\x00\x00WAVE") is None


def test_extract_features_fills_audio_meta(spark):
    from twitter_to_sqlite_spark.functions import multimodal as M

    rows = [(1, _wav()), (2, _flac()), (3, b"plain bytes")]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in
           M.extract_features(media, use_real_codec=True).collect()}
    assert (got[1]["sample_rate"], got[1]["channels"],
            got[1]["duration_ms"]) == (16000, 2, 1000)
    assert got[2]["sample_rate"] == 48000
    assert got[3]["sample_rate"] is None
    # image dims stay NULL for audio; byte stats real for all
    assert got[1]["width"] is None
    assert all(got[m]["n_bytes"] > 0 for m in got)


def _mp4(timescale=1000, duration=7500):
    import struct

    def box(typ, body):
        return struct.pack(">I", 8 + len(body)) + typ + body

    mvhd = bytes([0, 0, 0, 0]) \
        + struct.pack(">II", 0, 0) \
        + struct.pack(">II", timescale, duration) \
        + b"\x00" * 80
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    moov = box(b"moov", box(b"mvhd", mvhd))
    return ftyp + moov


def test_probe_video_duration_mp4():
    from twitter_to_sqlite_spark.functions import multimodal as M

    assert M.probe_video_duration(_mp4()) == 7500
    assert M.probe_video_duration(_mp4(timescale=600, duration=600)) == 1000
    assert M.probe_video_duration(b"not a video") is None
    assert M.probe_video_duration(None) is None
    # truncated moov must bail, not crash
    assert M.probe_video_duration(_mp4()[:20]) is None


def test_extract_features_fills_video_duration(spark):
    from twitter_to_sqlite_spark.functions import multimodal as M

    media = spark.createDataFrame(
        [(7, _mp4())], "media_id long, payload binary")
    r = M.extract_features(media, use_real_codec=True).collect()[0]
    assert r["duration_ms"] == 7500
    assert r["sample_rate"] is None and r["width"] is None


def test_probes_clamp_absurd_durations_instead_of_crashing():
    """Corrupt headers encoding >int32 durations must degrade to None
    (the malformed-input contract), never crash the Arrow batch."""
    import struct

    from twitter_to_sqlite_spark.functions import multimodal as M

    # WAV with byte_rate=1 and a 4 GB data chunk -> ~4e12 ms
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 1, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0xF0000000))
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    got = M.probe_audio_meta(wav)
    assert got is not None and got[2] is None and got[0] == 8000

    # mvhd v0 with the 0xFFFFFFFF "undefined duration" convention
    mvhd = bytes([0, 0, 0, 0]) + struct.pack(">II", 0, 0) \
        + struct.pack(">II", 1000, 0xFFFFFFFF) + b"\x00" * 80
    box = lambda t, b_: struct.pack(">I", 8 + len(b_)) + t + b_
    mp4 = box(b"ftyp", b"isom") + box(b"moov", box(b"mvhd", mvhd))
    assert M.probe_video_duration(mp4) is None

    # mvhd v0 with timescale=1 -> seconds-scale duration overflowing i32
    mvhd2 = bytes([0, 0, 0, 0]) + struct.pack(">II", 0, 0) \
        + struct.pack(">II", 1, 0x7FFFFFFF) + b"\x00" * 80
    mp42 = box(b"ftyp", b"isom") + box(b"moov", box(b"mvhd", mvhd2))
    assert M.probe_video_duration(mp42) is None


def test_hostile_audio_headers_degrade_to_none():
    """ADVICE r5: an AIFF COMM chunk with exponent 0x7FFF must not
    raise OverflowError, and >int32 sample rates/channels from corrupt
    WAV/AIFF headers must clamp to None — the malformed-input contract
    covers every IntegerType-bound field, not just duration."""
    import struct

    from twitter_to_sqlite_spark.functions import multimodal as M

    # AIFF with a hostile max exponent (inf/NaN territory in real
    # extended80): previously OverflowError, now 0.0 -> rejected.
    comm = struct.pack(">hLh", 1, 44100, 16) \
        + struct.pack(">HQ", 0x7FFF, 1 << 63)
    body = b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
    assert M.probe_audio_meta(
        b"FORM" + struct.pack(">I", len(body)) + body) is None

    # AIFF whose decoded rate is finite but exceeds int32: rate field
    # clamps to None instead of crashing the Arrow int32 conversion.
    exp = 16383 + 63 + 33            # mant=1<<63 -> rate = 2^33
    comm2 = struct.pack(">hLh", 1, 0, 16) \
        + struct.pack(">HQ", exp, 1 << 63)
    body2 = b"AIFF" + b"COMM" + struct.pack(">I", len(comm2)) + comm2
    got = M.probe_audio_meta(
        b"FORM" + struct.pack(">I", len(body2)) + body2)
    assert got is not None and got[0] is None

    # WAV fmt chunk with sample_rate = 0xF0000000 (reproduced in the
    # advisory): clamps to None, channels/duration untouched.
    fmt = struct.pack("<HHIIHH", 1, 2, 0xF0000000, 64000, 4, 16)
    bodyw = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
             + b"data" + struct.pack("<I", 64000))
    gotw = M.probe_audio_meta(b"RIFF" + struct.pack("<I", len(bodyw)) + bodyw)
    assert gotw == (None, 2, 1000)
