"""Multimodal metadata curation — every decode in the repo, end to end.

A media corpus lands as opaque binary columns; this file runs the full
pure-Python decode stack over Arrow batches (blobs never leave the
executors) exactly as a 100 TB media-curation pipeline would:

  1. container sniff + dimensions   (decode_image_headers: PNG/JPEG/GIF/
                                     BMP/WebP)
  2. audio/video container headers  (decode_av_headers: WAV fmt/data,
                                     MP4 mvhd)
  3. REAL pixel decode → aHash      (perceptual_hash over a genuine BMP,
                                     use_fake=False) + duplicate groups
  4. REAL WAV PCM decode → features (audio_features: duration, peak,
                                     energy, zero crossings)
  5. REAL JPEG EXIF metadata        (decode_exif: orientation, camera)
  6. REAL MP3 ID3v2 + frame header  (decode_mp3_meta: title/artist/
                                     bitrate/duration)
  7. REAL MP4 sample tables         (sample_keyframes: the keyframe
                                     index, no video decoder needed)

Every operator here is value-gated against a DuckDB oracle in
__spark_entry__.py (entries m03-m13); this file wires them together as
executable documentation over small synthesized blobs.

Run: python examples/media_metadata.py
"""

from __future__ import annotations

import struct
import sys
import zlib

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from icedb_spark.operators import (
    audio_features,
    decode_av_headers,
    decode_exif,
    decode_image_headers,
    decode_mp3_meta,
    perceptual_hash,
    phash_dup_groups,
    sample_keyframes,
)
from icedb_spark.session import get_spark


def bmp(gray_rows):
    """Minimal 24-bit BI_RGB BMP (bottom-up, padded rows)."""
    h = len(gray_rows)
    w = len(gray_rows[0])
    row = (w * 3 + 3) & ~3
    header = (
        b"BM" + struct.pack("<I", 54 + row * h) + b"\0" * 4
        + struct.pack("<I", 54)
        + struct.pack("<IiiHHIIIIII", 40, w, h, 1, 24, 0, row * h, 0, 0, 0, 0)
    )
    data = b""
    for y in range(h - 1, -1, -1):
        line = b"".join(bytes([g, g, g]) for g in gray_rows[y])
        data += line + b"\0" * (row - len(line))
    return header + data


def wav(samples, sr=8000):
    data = b"".join(struct.pack("<h", s) for s in samples)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def exif_jpeg(orientation, make):
    mk = make.encode() + b"\x00"
    tail_off = 8 + 2 + 24 + 4
    tiff = (
        b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", 2)
        + struct.pack("<HHI", 0x010F, 2, len(mk))
        + struct.pack("<I", tail_off)
        + struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
        + struct.pack("<I", 0) + mk
    )
    payload = b"Exif\x00\x00" + tiff
    return (
        b"\xff\xd8\xff\xe1" + struct.pack(">H", len(payload) + 2)
        + payload + b"\xff\xd9"
    )


def mp3(title, artist):
    frames = b""
    for fid, text in ((b"TIT2", title), (b"TPE1", artist)):
        payload = b"\x00" + text.encode("latin-1")
        frames += fid + struct.pack(">I", len(payload)) + b"\x00\x00" + payload
    sz = len(frames)
    ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F])
    return b"ID3\x03\x00\x00" + ss + frames + b"\xff\xfb\x90\x00" + b"\x00" * 128


def mp4(runs, stss):
    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    mdhd = box(b"mdhd", b"\x00" * 12 + struct.pack(">II", 1000, 0) + b"\x00" * 4)
    stts = box(b"stts", b"\x00" * 4 + struct.pack(">I", len(runs))
               + b"".join(struct.pack(">II", c, d) for c, d in runs))
    stssb = box(b"stss", b"\x00" * 4 + struct.pack(">I", len(stss))
                + b"".join(struct.pack(">I", s) for s in stss))
    moov = box(b"moov", box(b"trak", box(b"mdia", mdhd + box(b"minf", box(b"stbl", stts + stssb)))))
    return box(b"ftyp", b"isom\x00\x00\x00\x00") + moov


def main() -> None:
    spark = get_spark("icedb-spark-media")
    spark.sparkContext.setLogLevel("ERROR")

    gradient = [[(x * 32 + y * 4) % 256 for x in range(8)] for y in range(8)]
    flat = [[128] * 8 for _ in range(8)]
    media = spark.createDataFrame(
        [
            (0, bmp(gradient)),          # image: real pixels
            (1, bmp(gradient)),          # exact perceptual duplicate of 0
            (2, bmp(flat)),
            (3, wav([0, 1000, -1000, 2000, -2000, 0, 500, -500])),
            (4, exif_jpeg(6, "ACME Cam 9000")),
            (5, mp3("Night Drive", "The Executors")),
            (6, mp4([(3, 100), (4, 250)], stss=[1, 4, 6])),
        ],
        "media_id long, content binary",
    )

    print("container headers:")
    decode_image_headers(media).where("format is not null").show()
    print("a/v headers:")
    decode_av_headers(media).where("format is not null").show()

    print("real-pixel aHash duplicate groups (0 and 1 collide):")
    hashes = perceptual_hash(
        media.where("media_id in (0, 1, 2)"), bits=60, use_fake=False
    )
    phash_dup_groups(hashes).show(truncate=False)

    print("WAV waveform features:")
    audio_features(media.where("media_id = 3"), use_fake=False).show()

    print("JPEG EXIF:")
    decode_exif(media.where("media_id = 4")).show(truncate=False)

    print("MP3 ID3v2 + frame header:")
    decode_mp3_meta(media.where("media_id = 5")).show(truncate=False)

    print("MP4 keyframe index (stts/stss):")
    sample_keyframes(media.where("media_id = 6")).show()


if __name__ == "__main__":
    main()
