"""MP3 frame-walk + MP4 box-walk parsers and the unified media-metadata
featurizer (T19 capstone: container metadata without sample decode).

Reference treats media files as opaque staged blobs
(duckdb-api-service/src/storage/files.py); the container walk here is the
catalog stage a training-data crawl adds on top.
"""
import struct

import pytest

from keboola_storage_duckdb_spark.functions.multimodal import (
    _MP3_BITRATES,
    _MP3_RATES,
    extract_media_metadata,
    parse_mp3,
    parse_mp4,
    sniff_media,
)


# ---------------------------------------------------------------- builders
def mp3_frame(kbps_idx, rate_idx=0, pad=0, mono=False, vbits=3, lbits=1,
              fill=b"\x00"):
    """One MPEG audio frame with a valid header and deterministic body."""
    b1 = 0xE0 | (vbits << 3) | (lbits << 1) | 1      # no CRC
    b2 = (kbps_idx << 4) | (rate_idx << 2) | (pad << 1)
    b3 = 0xC0 if mono else 0x00
    hdr = bytes([0xFF, b1, b2, b3])
    lyr = 4 - lbits
    vgroup = 1 if vbits == 3 else 2
    kbps = _MP3_BITRATES[(vgroup, lyr)][kbps_idx - 1]
    rate = _MP3_RATES[vbits][rate_idx]
    spf = 384 if lyr == 1 else (1152 if lyr == 2 or vgroup == 1 else 576)
    if lyr == 1:
        flen = (12 * kbps * 1000 // rate + pad) * 4
    else:
        flen = spf // 8 * kbps * 1000 // rate + pad
    return hdr + fill * (flen - 4)


def id3v2(size=17, footer=False):
    flags = 0x10 if footer else 0
    body = b"x" * (size + (10 if footer else 0))
    return (b"ID3\x04\x00" + bytes([flags])
            + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                     (size >> 7) & 0x7F, size & 0x7F]) + body)


def box(t, body):
    return struct.pack(">I", 8 + len(body)) + t + body


def mp4_stream(dur_ms=4500, w=640, h=360, with_audio=False, mvhd_v1=False,
               largesize_mdat=False):
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isommp42")
    if mvhd_v1:
        mvhd = box(b"mvhd", b"\x01\x00\x00\x00"
                   + struct.pack(">QQIQ", 1, 2, 1000, dur_ms)
                   + b"\x00" * 80)
    else:
        mvhd = box(b"mvhd", b"\x00\x00\x00\x00"
                   + struct.pack(">IIII", 1, 2, 1000, dur_ms)
                   + b"\x00" * 80)
    tkhd = box(b"tkhd", b"\x00\x00\x00\x07" + b"\x00" * 76
               + struct.pack(">HHHH", w, 0, h, 0))
    mdhd = box(b"mdhd", b"\x00\x00\x00\x00"
               + struct.pack(">IIII", 1, 2, 90000, dur_ms * 90)
               + b"\x00" * 4)
    hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"\x00")
    avc1 = (struct.pack(">I", 86 + 8) + b"avc1" + b"\x00" * 24
            + struct.pack(">HH", w, h) + b"\x00" * 50)
    stsd = box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + avc1)
    mdia = box(b"mdia", mdhd + hdlr + box(b"minf", box(b"stbl", stsd)))
    traks = box(b"trak", tkhd + mdia)
    if with_audio:
        hdlr_a = box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12
                     + b"\x00")
        mp4a = (struct.pack(">I", 36 + 8) + b"mp4a" + b"\x00" * 16
                + struct.pack(">HH", 2, 16) + b"\x00" * 4
                + struct.pack(">HH", 44100, 0))
        stsd_a = box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                     + mp4a)
        traks += box(b"trak", box(b"mdia", mdhd + hdlr_a
                                  + box(b"minf", box(b"stbl", stsd_a))))
    moov = box(b"moov", mvhd + traks)
    if largesize_mdat:
        mdat = (struct.pack(">I", 1) + b"mdat"
                + struct.pack(">Q", 16 + 20) + b"\xAB" * 20)
    else:
        mdat = box(b"mdat", b"\xAB" * 20)
    return ftyp + moov + mdat


# -------------------------------------------------------------------- MP3
def test_mp3_cbr_with_id3v2():
    s = id3v2(17) + b"".join(mp3_frame(9) for _ in range(5))
    r = parse_mp3(s)
    assert (r["version"], r["layer"], r["sample_rate"], r["channels"]) \
        == ("1", 3, 44100, 2)
    assert r["n_frames"] == 5 and r["bitrate_kbps"] == 128
    assert not r["vbr"]
    assert r["duration_ms"] == 5 * 1152 * 1000.0 / 44100
    assert r["consumed_bytes"] == 5 * (144 * 128000 // 44100)


def test_mp3_id3v2_footer_flag():
    s = id3v2(8, footer=True) + mp3_frame(9, mono=True)
    r = parse_mp3(s)
    assert r["n_frames"] == 1 and r["channels"] == 1


def test_mp3_vbr_average_and_flag():
    frames = [mp3_frame(9), mp3_frame(12), mp3_frame(9), mp3_frame(12)]
    r = parse_mp3(b"".join(frames))
    assert r["vbr"] and r["n_frames"] == 4
    total = sum(len(f) for f in frames)
    assert r["bitrate_kbps"] == total * 8 * 44100 // (4 * 1152) // 1000


def test_mp3_layer1_and_mpeg2():
    r1 = parse_mp3(mp3_frame(5, lbits=3))          # Layer I
    assert r1["layer"] == 1 and r1["n_samples"] == 384
    r2 = parse_mp3(mp3_frame(5, vbits=2))          # MPEG2 Layer III
    assert r2["version"] == "2" and r2["sample_rate"] == 22050
    assert r2["n_samples"] == 576


def test_mp3_padding_changes_frame_len():
    r = parse_mp3(mp3_frame(9, pad=1) + mp3_frame(9, pad=0))
    assert r["n_frames"] == 2
    assert r["consumed_bytes"] == 2 * (144 * 128000 // 44100) + 1


def test_mp3_xing_frame_count():
    base = mp3_frame(9)
    # Xing sits after 32 bytes of MPEG1-stereo side info (no CRC)
    body = bytearray(base)
    off = 4 + 32
    body[off:off + 4] = b"Xing"
    body[off + 4:off + 8] = struct.pack(">I", 1)       # FRAMES flag
    body[off + 8:off + 12] = struct.pack(">I", 1234)
    r = parse_mp3(bytes(body))
    assert r["xing_frames"] == 1234


def test_mp3_truncated_and_garbage():
    good = mp3_frame(9)
    r = parse_mp3(good + good[: len(good) // 2])   # truncated final frame
    assert r["n_frames"] == 1
    r2 = parse_mp3(good + b"TAG" + b"\x00" * 125)  # trailing ID3v1
    assert r2["n_frames"] == 1
    with pytest.raises(ValueError):
        parse_mp3(b"\x00\x01\x02\x03" * 10)
    with pytest.raises(ValueError):
        parse_mp3(bytes([0xFF, 0xFB, 0x00, 0x00]) * 3)   # free bitrate


def test_mp3_parameter_change_stops_walk():
    # sample-rate switch mid-stream: stop, keep the prefix
    r = parse_mp3(mp3_frame(9, rate_idx=0) + mp3_frame(9, rate_idx=1))
    assert r["n_frames"] == 1


# -------------------------------------------------------------------- MP4
def test_mp4_video_only():
    m = parse_mp4(mp4_stream())
    assert m["brand"] == "isom" and m["duration_ms"] == 4500.0
    assert (m["video_codec"], m["width"], m["height"]) == ("avc1", 640, 360)
    assert m["n_tracks"] == 1 and m["has_mdat"]
    assert m["audio_codec"] is None


def test_mp4_audio_track_and_mvhd_v1():
    m = parse_mp4(mp4_stream(with_audio=True, mvhd_v1=True))
    assert m["n_tracks"] == 2 and m["duration_ms"] == 4500.0
    assert m["audio_codec"] == "mp4a"
    assert m["audio_channels"] == 2 and m["audio_sample_rate"] == 44100
    trk = [t for t in m["tracks"] if t.get("handler") == "vide"][0]
    assert trk["timescale"] == 90000 and trk["duration"] == 4500 * 90


def test_mp4_largesize_box():
    m = parse_mp4(mp4_stream(largesize_mdat=True))
    assert m["has_mdat"] and m["video_codec"] == "avc1"


def test_mp4_rejects_non_bmff():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 64)
    with pytest.raises(ValueError):
        # ftyp but no moov
        parse_mp4(box(b"ftyp", b"isom" + struct.pack(">I", 0)))


def test_mp4_truncated_tail_keeps_walked_metadata():
    s = mp4_stream()
    # cut inside the trailing mdat: moov already walked
    m = parse_mp4(s[:-10])
    assert m["width"] == 640


# ------------------------------------------------------------- sniff/unify
def test_sniff_routes_every_format():
    from keboola_storage_duckdb_spark.functions.multimodal import (
        encode_ppm)
    import numpy as np

    wav = (b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
           + b"data" + struct.pack("<I", 8) + bytes(range(8)))
    y4m = (b"YUV4MPEG2 W4 H2 F25:1 C420\n"
           + b"FRAME\n" + b"\x80" * 12)
    ppm = encode_ppm(np.zeros((2, 3, 3), np.uint8))
    cases = {
        "mp3": b"".join(mp3_frame(9) for _ in range(2)),
        "mp4": mp4_stream(),
        "wav": wav,
        "y4m": y4m,
        "ppm": ppm,
    }
    for want, payload in cases.items():
        assert sniff_media(payload)["container"] == want
    with pytest.raises(ValueError):
        sniff_media(b"not a media file at all")


def test_extract_media_metadata_mixed(spark):
    rows = [
        (1, b"".join(mp3_frame(9, mono=True) for _ in range(3))),
        (2, mp4_stream(with_audio=True)),
        (3, b"junk bytes"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r["id"]: r for r in extract_media_metadata(df).collect()}
    assert out[1]["container"] == "mp3" and out[1]["channels"] == 1
    assert out[1]["n_frames"] == 3 and out[1]["parsed"]
    assert out[2]["container"] == "mp4" and out[2]["n_tracks"] == 2
    assert out[2]["width"] == 640 and out[2]["sample_rate"] == 44100
    assert not out[3]["parsed"] and out[3]["container"] is None
    assert not out[4]["parsed"] and out[4]["n_bytes"] is None
    assert out[1]["duration_ms"] == 3 * 1152 * 1000.0 / 44100


def test_corrupt_png_idat_yields_unparsed(spark):
    import zlib

    def ck(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + ck(b"IHDR", ihdr)
           + ck(b"IDAT", b"\x99\x99not deflate\x00") + ck(b"IEND", b""))
    with pytest.raises(ValueError):
        sniff_media(bad)
    df = spark.createDataFrame([(1, bad)], "id long, payload binary")
    row = extract_media_metadata(df).collect()[0]
    assert not row["parsed"] and row["n_bytes"] == len(bad)


def test_stream_media_metadata_matches_batch(spark, tmp_path):
    """Structured-Streaming twin: extract_media_metadata is a stateless
    mapInPandas, so the same featurizer runs unchanged over readStream
    (availableNow) — the streaming catalog stage of a live media crawl."""
    rows = [
        (1, b"".join(mp3_frame(9, mono=True) for _ in range(3))),
        (2, mp4_stream(with_audio=True)),
        (3, b"\x01 junk"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    src = str(tmp_path / "media_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = extract_media_metadata(stream)
    q = (out.writeStream.format("memory").queryName("media_meta_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["id"]: (r["container"], r["n_frames"], r["n_tracks"],
                     r["parsed"])
           for r in spark.sql("SELECT * FROM media_meta_test").collect()}
    want = {r["id"]: (r["container"], r["n_frames"], r["n_tracks"],
                      r["parsed"])
            for r in extract_media_metadata(df).collect()}
    assert got == want and len(got) == 3


# ------------------------------------------------------- junk-corpus armor
def test_mp4_nested_box_bomb_no_recursion_error():
    # 10k-deep nested moov boxes: must parse (depth-capped), not
    # RecursionError an executor
    depth = 10_000
    inner = b""
    for _ in range(depth):
        inner = box(b"moov", inner)
    payload = box(b"ftyp", b"isom" + struct.pack(">I", 0)) + inner
    m = parse_mp4(payload)
    assert m["brand"] == "isom" and m["n_tracks"] == 0


def test_png_zlib_bomb_bounded():
    import zlib

    from keboola_storage_duckdb_spark.functions.multimodal import (
        decode_image)

    def ck(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    # 2x2 gray IHDR but an IDAT that inflates to 100 MB: the bounded
    # inflate must stop at the expected raster size and reject
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * 100_000_000, 9)   # ~100 KB compressed
    payload = (b"\x89PNG\r\n\x1a\n" + ck(b"IHDR", ihdr)
               + ck(b"IDAT", bomb) + ck(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_image(payload)


def test_pixel_cap_rejects_giant_headers():
    import zlib

    from keboola_storage_duckdb_spark.functions.multimodal import (
        decode_image)

    def ck(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", 65535, 65535, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + ck(b"IHDR", ihdr)
           + ck(b"IDAT", zlib.compress(b"\x00")) + ck(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_image(png)
    # JPEG declaring 65535x65535 must be rejected before allocating
    # ~34 GB of component planes
    def seg(m, body):
        return bytes([0xFF, m]) + (len(body) + 2).to_bytes(2, "big") + body

    sof = seg(0xC0, bytes([8]) + (65535).to_bytes(2, "big")
              + (65535).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    dqt = seg(0xDB, b"\x00" + bytes([8] * 64))
    dht = seg(0xC4, bytes([0x00]) + bytes([0] * 16) + b"")
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8" + dqt + sof + dht + sos + b"\x00\x00"
                     + b"\xff\xd9")


def test_fuzz_sniff_media_only_valueerror():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=256))
    def run(payload):
        try:
            sniff_media(payload)
        except ValueError:
            pass

    run()


def test_fuzz_mp3_mp4_prefix_mutations():
    """Truncations and byte flips of VALID streams — the realistic
    corruption shape — must yield ValueError or a successful parse,
    never any other exception."""
    mp3 = id3v2(5) + b"".join(mp3_frame(9) for _ in range(3))
    mp4 = mp4_stream(with_audio=True)
    for base, parse in ((mp3, parse_mp3), (mp4, parse_mp4)):
        for cut in range(0, len(base), 7):
            try:
                parse(base[:cut])
            except ValueError:
                pass
        for flip in range(0, len(base), 11):
            mut = bytearray(base)
            mut[flip] ^= 0xFF
            try:
                parse(bytes(mut))
            except ValueError:
                pass
