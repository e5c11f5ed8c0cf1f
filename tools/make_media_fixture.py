#!/usr/bin/env python3
"""Golden media fixture for q55_multimodal (pattern of make_chunk_fixtures.py).

Generates a small binary-media table with pure-stdlib encoders — hand-rolled
PNG (zlib + struct), stdlib `wave` WAV, and deterministic opaque blobs — and
computes the EXPECTED decode metadata + byte-histogram feature for every row
independently of the Scala code under test:

  - PNG rows:    format/width/height are what this script wrote;
  - WAV rows:    format 'wave', (sampleRate, channels, nFrames) as written;
  - opaque rows: the stub contract replicated from first principles
                 (java.util.Arrays.hashCode over signed bytes, truncated
                 int division, floorMod) — a cross-language check that the
                 JVM stub is the pure function it claims to be;
  - exp_bin0:    fraction of payload bytes < 16, computed float32-exactly
                 the way a Float histogram division rounds.

Output: src/test/resources/golden/media.parquet with columns
  media_id, media_type, payload, exp_format, exp_width, exp_height,
  exp_n_frames, exp_bin0

Run: python3 tools/make_media_fixture.py
"""
import hashlib
import io
import struct
import wave
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = "src/test/resources/golden/media.parquet"


def make_png(width, height, seed):
    """Minimal truecolor (8-bit RGB) PNG, no external libs."""
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter: none
        for x in range(width):
            raw.append((x * 7 + y * 13 + seed) % 256)
            raw.append((x * 11 + y * 3 + 2 * seed) % 256)
            raw.append((x * 5 + y * 17 + 3 * seed) % 256)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def make_wav(rate, channels, n_frames, seed):
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(2)
    w.setframerate(rate)
    pcm = bytearray()
    for i in range(n_frames * channels):
        v = ((seed * 1009 + i * 31) % 65536) - 32768
        pcm += struct.pack("<h", v)
    w.writeframes(bytes(pcm))
    w.close()
    return buf.getvalue()


def make_opaque(seed, length):
    out = bytearray()
    k = 0
    while len(out) < length:
        out += hashlib.sha256(f"media{seed}-{k}".encode()).digest()
        k += 1
    return bytes(out[:length])


def java_array_hash(b):
    """java.util.Arrays.hashCode(byte[]): h = 31*h + signed(b), int32 wrap."""
    h = 1
    for x in b:
        s = x - 256 if x > 127 else x
        h = (31 * h + s) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def trunc_div(a, b):
    """Java int division truncates toward zero; Python // floors."""
    q = abs(a) // b
    return -q if a < 0 else q


def stub_expect(payload):
    h = java_array_hash(payload)
    fmt = ["png", "jpeg", "webp"][h % 3]          # Python % == floorMod
    w = 64 + (h % 1024)
    ht = 64 + (trunc_div(h, 1024) % 1024)
    return (f"stub_{fmt}", w, ht, 1 + (h % 300))


def bin0(payload):
    """First bin of the L1-normalized 16-bin byte histogram, float32 math."""
    n = np.float32(sum(1 for x in payload if x < 16))
    return float(n / np.float32(len(payload)))


def main():
    rows = []
    for mid in range(20):  # real PNG images
        w, h = 8 + (mid * 3) % 33, 8 + (mid * 5) % 29
        p = make_png(w, h, mid)
        rows.append((mid, "image", p, "png", w, h, 1, bin0(p)))
    for i in range(20):    # real WAV audio
        mid = 20 + i
        rate = [8000, 16000, 22050, 44100][i % 4]
        ch = 1 + i % 2
        nf = 100 + (i * 37) % 400
        p = make_wav(rate, ch, nf, mid)
        rows.append((mid, "audio", p, "wave", rate, ch, nf, bin0(p)))
    for i in range(20):    # opaque payloads -> deterministic stub
        mid = 40 + i
        p = make_opaque(mid, 200 + (i * 53) % 800)
        fmt, w, h, nf = stub_expect(p)
        rows.append((mid, "binary", p, fmt, w, h, nf, bin0(p)))

    table = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "media_type": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        "exp_format": pa.array([r[3] for r in rows], pa.string()),
        "exp_width": pa.array([r[4] for r in rows], pa.int32()),
        "exp_height": pa.array([r[5] for r in rows], pa.int32()),
        "exp_n_frames": pa.array([r[6] for r in rows], pa.int32()),
        "exp_bin0": pa.array([r[7] for r in rows], pa.float64()),
    })
    pq.write_table(table, OUT)
    print(f"wrote {table.num_rows} rows to {OUT}")


if __name__ == "__main__":
    main()
