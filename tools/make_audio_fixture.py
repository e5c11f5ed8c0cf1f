#!/usr/bin/env python3
"""Golden audio fixture for q216_audio_dedup (pattern of make_media_fixture.py).

Builds a small WAV table with PLANTED duplicate groups and computes the
EXPECTED amplitude-envelope fingerprint for every row independently of the
Scala code under test (`Multimodal.audioEnvelopeHash`): 16 equal segments,
per-segment mean |amplitude| via exact rational compares, each segment
quantized to 4 bits relative to the loudest segment. All math is integer,
so the fingerprint is deterministic and exactly invariant under integer
volume scaling — which is what the planted groups exercise:

  - group A: one clip + integer x2 / x3 volume rescales (3 members);
  - group B: a different envelope + x4 rescale (2 members);
  - silent group: two all-zero clips of different lengths (fingerprint 0);
  - mono/stereo pair: a mono clip and its both-channels-identical stereo
    twin (the downmix preserves per-segment means exactly);
  - distinct singles that must NOT group;
  - undecodable rows (opaque bytes, 8-bit PCM, < 16 frames) that the
    operator must drop (fingerprint null).

Output: src/test/resources/golden/audio.parquet with columns
  media_id, payload, exp_fingerprint (nullable int64)

Run: python3 tools/make_audio_fixture.py
"""
import io
import struct
import wave

import pyarrow as pa
import pyarrow.parquet as pq

OUT = "src/test/resources/golden/audio.parquet"
SEGMENTS = 16


def make_wav(samples_per_channel, channels=1, rate=16000, sampwidth=2):
    """samples_per_channel: list of per-frame sample lists (len == channels)."""
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(sampwidth)
    w.setframerate(rate)
    pcm = bytearray()
    for frame in samples_per_channel:
        for v in frame:
            if sampwidth == 2:
                pcm += struct.pack("<h", v)
            else:
                pcm += struct.pack("<B", (v + 128) & 0xFF)
    w.writeframes(bytes(pcm))
    w.close()
    return buf.getvalue()


def envelope_fp(frames, channels):
    """Independent reimplementation of the 16-segment envelope fingerprint.

    frames: list of per-frame sample lists. Exact integer math throughout
    (Python ints are unbounded; the Scala side uses BigInt for the same
    rational compares), signed-64 wrap at the end to match the JVM Long.
    """
    n = len(frames)
    if n < SEGMENTS:
        return None
    sums = [0] * SEGMENTS
    counts = [0] * SEGMENTS
    for i, frame in enumerate(frames):
        seg = i * SEGMENTS // n
        for v in frame:
            sums[seg] += abs(v)
        counts[seg] += channels
    mi = 0
    for s in range(1, SEGMENTS):
        if sums[s] * counts[mi] > sums[mi] * counts[s]:
            mi = s
    fp = 0
    for s in range(SEGMENTS):
        q = 0 if sums[mi] == 0 else (sums[s] * 15 * counts[mi]) // (sums[mi] * counts[s])
        fp = (fp << 4) | q
    fp &= 0xFFFFFFFFFFFFFFFF
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def ramp_clip(n, peak, phase=0):
    """Mono clip whose segment means ramp up: deterministic, no RNG."""
    return [[((i + phase) * peak // n) * (1 if i % 2 == 0 else -1)]
            for i in range(n)]


def burst_clip(n, peak, hot_seg):
    """Mono clip loud only in one segment."""
    out = []
    for i in range(n):
        seg = i * SEGMENTS // n
        v = peak if seg == hot_seg else peak // 8
        out.append([v if i % 2 == 0 else -v])
    return out


def scale(frames, c):
    return [[v * c for v in fr] for fr in frames]


def main():
    rows = []  # (media_id, payload, exp_fp)

    def add(mid, frames, channels=1, sampwidth=2, decodable=True):
        payload = make_wav(frames, channels=channels, sampwidth=sampwidth)
        fp = envelope_fp(frames, channels) if (decodable and sampwidth == 2) else None
        rows.append((mid, payload, fp))
        return fp

    # group A: ramp envelope, integer volume x1 / x2 / x3
    base_a = ramp_clip(480, 9000)
    fa = [add(0, base_a), add(1, scale(base_a, 2)), add(2, scale(base_a, 3))]
    assert len(set(fa)) == 1, "group A members must share a fingerprint"

    # group B: burst envelope (segment 11 hot), x1 / x4
    base_b = burst_clip(320, 7000, hot_seg=11)
    fb = [add(3, base_b), add(4, scale(base_b, 4))]
    assert len(set(fb)) == 1, "group B members must share a fingerprint"
    assert fb[0] != fa[0]

    # silent group: all-zero clips, different lengths -> fingerprint 0
    f5 = add(5, [[0]] * 200)
    f6 = add(6, [[0]] * 333)
    assert f5 == f6 == 0

    # mono/stereo pair: both stereo channels identical to the mono clip
    mono = burst_clip(256, 11000, hot_seg=2)
    f7 = add(7, mono)
    f13 = add(13, [[fr[0], fr[0]] for fr in mono], channels=2)
    assert f7 == f13, "stereo twin must downmix to the mono fingerprint"

    # distinct singles: different envelopes, must not collide
    f8 = add(8, burst_clip(300, 8000, hot_seg=5))
    f9 = add(9, ramp_clip(400, 5000, phase=137))
    all_groups = {fa[0], fb[0], 0, f7}
    assert f8 not in all_groups and f9 not in all_groups and f8 != f9

    # undecodable / unsupported rows -> fingerprint null, operator drops
    rows.append((10, b"\x00not-audio" + bytes(range(64)), None))  # opaque
    add(11, ramp_clip(100, 50), sampwidth=1, decodable=False)     # 8-bit PCM
    add(12, ramp_clip(8, 9000))                                   # < 16 frames

    rows.sort(key=lambda r: r[0])
    table = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "payload": pa.array([r[1] for r in rows], pa.binary()),
        "exp_fingerprint": pa.array([r[2] for r in rows], pa.int64()),
    })
    pq.write_table(table, OUT)
    n_groups = len({r[2] for r in rows if r[2] is not None})
    print(f"wrote {table.num_rows} rows to {OUT} "
          f"({n_groups} distinct fingerprints incl. singles)")


if __name__ == "__main__":
    main()
