"""Multimodal plumbing tests: schemas, Arrow batch shapes, determinism
across repartitioning, and the real-backend gate."""

from __future__ import annotations

import pytest

from wikihadoop_spark.multimodal.media import (
    MEDIA_SCHEMA,
    audio_features,
    image_metadata,
    image_resize,
    synthetic_media,
    video_frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=40)


def test_image_metadata(spark, media):
    rows = {r.media_id: r for r in image_metadata(media).collect()}
    assert len(rows) == 40
    r = rows[0]
    assert r.width > 0 and r.height > 0 and r.channels == 3
    assert len(r.content_hash) == 16


def test_determinism_across_partitioning(spark, media):
    a = sorted(map(tuple, image_metadata(media).collect()))
    b = sorted(map(tuple, image_metadata(media.repartition(7)).collect()))
    assert a == b


def test_image_resize_bytes(spark, media):
    rows = image_resize(media, width=64, height=64).collect()
    assert all(isinstance(bytes(r.thumb), bytes) and len(r.thumb) >= 16 for r in rows)
    assert all(r.thumb_width == 64 for r in rows)


def test_audio_features_vector(spark, media):
    rows = audio_features(media, n_features=8).collect()
    assert all(len(r.features) == 8 for r in rows)
    assert all(-1.0 <= v <= 1.0 for r in rows for v in r.features)


def test_video_frame_fanout(spark, media):
    frames = video_frame_sample(media, max_frames=4).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    assert len(by_id) == 40
    assert all(1 <= len(v) <= 4 for v in by_id.values())
    # frame_idx strides by every_n_frames
    assert all(sorted(v) == [i * 30 for i in range(len(v))] for v in by_id.values())


def test_real_backend_gated(spark, media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed: the real image path is live (tested below)")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="backend='fake'"):
        image_metadata(media, backend="real")


def test_real_image_backend_with_pillow(spark):
    """Executed only where Pillow is installed: real PNG bytes flow
    through image_metadata (header decode) and image_resize (decode →
    resize → PNG re-encode) on the same mapInPandas plumbing the fake
    backend pins."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    from wikihadoop_spark.multimodal.media import MEDIA_SCHEMA, image_resize

    rows = []
    for i, (w, h) in enumerate([(32, 16), (7, 5), (128, 128)]):
        im = Image.new("RGB", (w, h), color=(i * 40, 100, 200))
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        rows.append((i, "image", buf.getvalue(), (f"src{i}", None, "image/png")))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    meta = {r.media_id: r for r in image_metadata(media, backend="real").collect()}
    assert (meta[0].width, meta[0].height, meta[0].channels) == (32, 16, 3)
    assert (meta[1].width, meta[1].height) == (7, 5)

    thumbs = image_resize(media, width=8, height=8, backend="real").collect()
    for t in thumbs:
        with Image.open(io.BytesIO(t.thumb)) as im:
            assert im.size == (8, 8)


def test_metadata_only_projection_skips_payload(spark, media, tmp_path):
    """meta-only reads must not touch payload chunks: verify the scan's
    ReadSchema excludes the binary column."""
    p = str(tmp_path / "media")
    media.write.parquet(p)
    df = spark.read.parquet(p).select("media_id", "kind", "meta.mime")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def _wav_bytes(rate=8000, seconds=2.0, amp_second_half=12000):
    """16-bit PCM mono WAV: first half silence, second half a 440 Hz
    sine — known duration, known per-slice energy profile."""
    import io
    import math
    import struct
    import wave

    n = int(rate * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = bytearray()
        for i in range(n):
            if i < n // 2:
                s = 0
            else:
                s = int(amp_second_half * math.sin(2 * math.pi * 440 * i / rate))
            frames += struct.pack("<h", s)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_real_wav_audio_backend(spark):
    """The stdlib WAV path is a REAL decode: exact duration from the
    container header and per-slice RMS energies that reflect the
    signal (silent first half -> ~0; sine second half -> amp/sqrt(2))."""
    payload = _wav_bytes()
    df = spark.createDataFrame(
        [(1, "audio", payload, ("s", None, "audio/wav"))], MEDIA_SCHEMA
    )
    rows = audio_features(df, n_features=8, backend="wav").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.duration_ms == 2000
    assert len(r.features) == 8
    # first 4 slices: silence
    assert all(v == 0.0 for v in r.features[:4])
    # last 4 slices: RMS of a 12000-amplitude sine ~ 12000/(32768*sqrt2) ~ 0.259
    assert all(0.2 < v < 0.3 for v in r.features[4:])


def test_real_audio_backend_with_torchaudio(spark, media):
    """Mirror of the Pillow gate for arbitrary-codec audio: runs only
    where torchaudio is importable (absent in this container)."""
    pytest.importorskip("torchaudio")
    audio_features(media, backend="real")


def test_wav_backend_rejects_non_wav(spark, media):
    import pytest as _pytest

    with _pytest.raises(Exception):
        audio_features(media, backend="wav").collect()


def _y4m_bytes(n_frames=10, w=4, h=2, chroma="420", trunc_last=False):
    """Deterministic uncompressed YUV4MPEG2 stream: frame k's planar
    bytes are (k*16+i) % 256 so tests can assert exact payloads.
    Plane sizes use per-plane ceiling division (ffmpeg's layout), so
    odd dimensions with subsampled chroma size correctly."""
    if chroma.startswith("420"):
        xd, yd = 2, 2
    elif chroma == "422":
        xd, yd = 2, 1
    else:
        xd, yd = 1, 1
    fb = w * h + (0 if chroma == "mono" else 2 * (-(-w // xd)) * (-(-h // yd)))
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C{chroma}\n".encode())
    for k in range(n_frames):
        out += b"FRAME\n"
        frame = bytes((k * 16 + i) % 256 for i in range(fb))
        out += frame[: fb // 2] if (trunc_last and k == n_frames - 1) else frame
    return bytes(out)


def test_real_y4m_video_backend(spark):
    """The stdlib Y4M path is a REAL decode: frame sizes derive from
    the header's W/H/C tags, sampling walks the FRAME markers, and the
    emitted payloads are the exact raw planar bytes of the sampled
    frames."""
    payload = _y4m_bytes(n_frames=10)
    df = spark.createDataFrame(
        [(1, "video", payload, ("s", None, "video/x-yuv4mpeg"))], MEDIA_SCHEMA
    )
    rows = video_frame_sample(
        df, every_n_frames=3, max_frames=3, backend="y4m"
    ).collect()
    assert [(r.media_id, r.frame_idx) for r in rows] == [(1, 0), (1, 3), (1, 6)]
    fb = 12  # 4x2 C420: 8 luma + 4 chroma bytes
    for r in rows:
        assert bytes(r.frame) == bytes(
            (r.frame_idx * 16 + i) % 256 for i in range(fb)
        )


def test_y4m_backend_edge_cases(spark):
    """Truncated trailing frame keeps the complete prefix; C444 frame
    sizing; non-Y4M payloads raise instead of decoding garbage."""
    import pytest as _pytest

    from wikihadoop_spark.multimodal.media import _y4m_frames

    # truncated final frame is dropped, not fatal
    frames = _y4m_frames(_y4m_bytes(n_frames=3, trunc_last=True), 1, 8)
    assert [i for i, _ in frames] == [0, 1]
    # ... including truncation MID-marker (upload cut inside b"FRAME")
    full = _y4m_bytes(n_frames=2)
    cut = full[: full.rindex(b"FRAME") + 3]  # ends with b"FRA"
    frames = _y4m_frames(cut, 1, 8)
    assert [i for i, _ in frames] == [0]
    # 4:4:4 triples the chroma payload
    frames = _y4m_frames(_y4m_bytes(n_frames=1, chroma="444"), 1, 8)
    assert len(frames[0][1]) == 4 * 2 * 3
    with _pytest.raises(ValueError, match="magic"):
        _y4m_frames(b"RIFFnot a video", 1, 8)
    with _pytest.raises(ValueError, match="colorspace"):
        _y4m_frames(b"YUV4MPEG2 W4 H2 C411\nFRAME\n", 1, 8)
    # odd dimensions with subsampled chroma: per-plane ceil sizing
    # (a truncating w*h*ratio would mis-walk and false-alarm on the
    # second FRAME marker)
    for w, h, chroma, want in [
        (5, 3, "420", 5 * 3 + 2 * 3 * 2),   # ceil(5/2)=3, ceil(3/2)=2
        (5, 3, "422", 5 * 3 + 2 * 3 * 3),   # ceil(5/2)=3, h=3
        (5, 3, "mono", 5 * 3),
    ]:
        frames = _y4m_frames(
            _y4m_bytes(n_frames=3, w=w, h=h, chroma=chroma), 1, 8
        )
        assert [i for i, _ in frames] == [0, 1, 2], (w, h, chroma)
        assert all(len(f) == want for _, f in frames), (w, h, chroma)


def test_video_frame_sample_validates_stride(spark, media):
    """A zero/negative stride or frame cap fails fast driver-side with
    a clear message, not a ZeroDivisionError inside an executor."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="every_n_frames"):
        video_frame_sample(media, every_n_frames=0)
    with _pytest.raises(ValueError, match="every_n_frames"):
        video_frame_sample(media, max_frames=0)


def test_real_video_backend_with_av(spark, media):
    """Mirror of the Pillow/torchaudio gates for compressed video:
    runs only where PyAV is importable (absent in this container)."""
    pytest.importorskip("av")
    video_frame_sample(media, backend="real")
