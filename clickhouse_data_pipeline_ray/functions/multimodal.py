"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a mime/meta sidecar;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages (model/codec state loaded once per actor, small batch
sizes because payload bytes dominate block size).

Three decoder tiers, auto-selected once per actor (never per batch):

- ``"real"``: third-party codec library (PIL / soundfile / ffmpeg) — not
  present in this container; raises ``NotImplementedError`` at the clearly
  marked point when forced without the library.
- ``"numpy"``: pure-numpy parsers for public container formats — baseline
  JPEG (full T.81 sequential DCT: huffman entropy coding, restart markers,
  4:2:0/4:2:2/4:4:4 sampling — functions/jpeg.py) and BMP (24-bit BI_RGB)
  for images, WAV (RIFF PCM16) for audio, Y4M (YUV4MPEG2) for video. These
  are real decoders of real byte layouts (encode/decode round-trip tested),
  needing no third-party dependency, so the multimodal path is genuinely
  functional in-container for the most common image format.
- ``"fake"``: deterministic hash-seeded outputs with the real output schema
  (kept for opaque payloads that are not parseable media).

``decoder="auto"`` resolves real → numpy (the numpy tier is always
available). Everything Ray-side — schema, batch sizing, actor signature,
output layout — is identical across tiers and tested
(tests/test_similarity_multimodal.py).
"""

from __future__ import annotations

import importlib.util
import shutil as _shutil
import struct

import numpy as np
import pyarrow as pa


def _codec_available(kind: str) -> bool:
    """Import-probe for the real codec backing each media kind (cheap: spec
    lookup only, no import side effects; the ffmpeg probe is a PATH check)."""
    if kind == "image":
        return importlib.util.find_spec("PIL") is not None
    if kind == "audio":
        return any(
            importlib.util.find_spec(m) is not None
            for m in ("soundfile", "torchaudio", "librosa")
        )
    if kind == "video":
        return _shutil.which("ffmpeg") is not None
    raise ValueError(kind)


def _resolve_decoder(requested: str, kind: str) -> str:
    """'auto' → 'real' iff the codec library is present, else 'numpy' (the
    pure-numpy tier is always available)."""
    if requested not in ("fake", "real", "numpy", "auto"):
        raise ValueError(requested)
    if requested == "auto":
        return "real" if _codec_available(kind) else "numpy"
    return requested


# ---------------------------------------------------------------------------
# Pure-numpy codecs: public uncompressed container formats, no third-party
# dependency. One format per modality — BMP / WAV / Y4M byte layouts.
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed BMP (BI_RGB, bottom-up rows,
    BGR byte order, rows padded to 4 bytes — the standard layout)."""
    h, w, c = arr.shape
    assert c == 3
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pixels = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP → (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    _size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=h * row_bytes, offset=offset)
    rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 mono samples → RIFF/WAVE PCM16."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono → (int16 samples, sample_rate). Walks the chunk
    list generically (a conforming writer may insert LIST/fact chunks)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sr, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or bits != 16 or channels != 1:
                raise ValueError("unsupported WAV variant (need PCM16 mono)")
        elif cid == b"data":
            samples = np.frombuffer(body, "<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, int(sr)


def encode_y4m(y_planes: np.ndarray) -> bytes:
    """(N, H, W) uint8 luma frames → YUV4MPEG2 (C444, flat U=V=128 chroma)."""
    n, h, w = y_planes.shape
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode()]
    chroma = np.full(h * w, 128, np.uint8).tobytes()
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(y_planes[i].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(payload: bytes) -> np.ndarray:
    """YUV4MPEG2 C444 → (N, H, W) uint8 luma planes."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode()
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    params = dict((t[0], t[1:]) for t in header.split()[1:])
    w, h = int(params["W"]), int(params["H"])
    # the Y4M spec defaults an absent C tag to 4:2:0 (1.5*w*h per frame) —
    # decoding that as C444 would silently consume two frames per iteration;
    # reject non-444 variants loudly like decode_bmp/decode_wav do
    colourspace = params.get("C", "420")
    if not colourspace.startswith("444"):
        raise ValueError(
            f"unsupported Y4M colourspace C{colourspace} (only C444 is "
            "implemented by this pure-numpy decoder)"
        )
    frame_bytes = 3 * w * h  # C444: full-size U and V planes
    frames, pos = [], nl + 1
    while pos < len(payload):
        fl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame header")
        body = payload[fl + 1 : fl + 1 + frame_bytes]
        frames.append(np.frombuffer(body[: w * h], np.uint8).reshape(h, w))
        pos = fl + 1 + frame_bytes
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8)

def _grid_pool(gray: np.ndarray, dim: int) -> np.ndarray:
    """Mean-pool a 2-D array into ``dim`` cells (8×8 for dim=64) — the
    deterministic feature used by the numpy decode tier."""
    side = int(np.sqrt(dim))
    h, w = gray.shape
    ys = np.linspace(0, h, side + 1).astype(int)
    xs = np.linspace(0, w, side + 1).astype(int)
    out = np.empty(side * side, np.float64)
    k = 0
    for i in range(side):
        for j in range(side):
            cell = gray[ys[i]: max(ys[i + 1], ys[i] + 1), xs[j]: max(xs[j + 1], xs[j] + 1)]
            out[k] = cell.mean()
            k += 1
    return out


MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("mime", pa.string()),
        pa.field("payload", pa.binary()),
    ]
)

IMAGE_FEATURE_DIM = 64


def _payload_seed(payload: bytes) -> int:
    import zlib

    return zlib.crc32(payload) & 0xFFFFFFFF


class ImageDecode:
    """Decode + resize + feature-extract for image payloads.

    Output: (media_id, height, width, channels, feature: list<float>[DIM]).
    Small batches (payloads dominate bytes) — pass batch_size explicitly.
    """

    def __init__(self, decoder: str = "fake", resize_to: tuple[int, int] = (224, 224)):
        self.decoder = _resolve_decoder(decoder, "image")
        self.resize_to = resize_to
        # real decoder state (e.g. a PIL import / model handle) would be
        # created HERE, once per actor.

    def _decode_one(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        if self.decoder == "real":
            if not _codec_available("image"):
                # STUB: no image codec available in this environment (probe
                # decoder="auto" to fall back to the fake codec instead).
                raise NotImplementedError(
                    "real image decoding requires PIL/opencv, not present in this container"
                )
            from io import BytesIO

            from PIL import Image

            img = Image.open(BytesIO(payload)).convert("RGB")
            w, h = img.size
            thumb = np.asarray(
                img.resize(self.resize_to), dtype=np.float32
            ).mean(axis=2).ravel()
            step = max(1, len(thumb) // IMAGE_FEATURE_DIM)
            feat = thumb[: step * IMAGE_FEATURE_DIM : step].astype(np.float32)
            feat = np.pad(feat, (0, IMAGE_FEATURE_DIM - len(feat)))
            return h, w, 3, feat
        if self.decoder == "numpy":
            # real decodes of real byte layouts, dispatched on magic:
            # baseline JPEG (functions/jpeg.py — full T.81 sequential DCT
            # with huffman/restarts/subsampling) or uncompressed BMP
            if payload[:2] == b"\xFF\xD8":
                from .jpeg import decode_jpeg_baseline

                arr = decode_jpeg_baseline(payload)
            else:
                arr = decode_bmp(payload)
            h, w = arr.shape[:2]
            gray = arr.mean(axis=2, dtype=np.float64)
            feat = _grid_pool(gray, IMAGE_FEATURE_DIM).astype(np.float32)
            return h, w, 3, feat
        rng = np.random.default_rng(_payload_seed(payload))
        h, w = (int(rng.integers(64, 1024)) for _ in range(2))
        feat = rng.standard_normal(IMAGE_FEATURE_DIM).astype(np.float32)
        return h, w, 3, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs, ws, cs, feats = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            h, w, c, f = self._decode_one(payload)
            hs.append(h)
            ws.append(w)
            cs.append(c)
            feats.append(f)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "height": pa.array(hs, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "channels": pa.array(cs, pa.int32()),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


class VideoFrameSample:
    """Sample N frame features per video payload.

    Output: one row per (media_id, frame_index) — a flat_map-shaped stage
    expressed as map_batches returning more rows than it takes in.
    """

    def __init__(self, decoder: str = "fake", frames_per_video: int = 4):
        self.decoder = _resolve_decoder(decoder, "video")
        self.n = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, lumas, feats = [], [], [], []
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            if self.decoder == "real":
                # STUB: no video codec (ffmpeg) in this environment.
                raise NotImplementedError("real frame sampling requires ffmpeg")
            if self.decoder == "numpy":
                planes = decode_y4m(payload)  # real decode (Y4M container)
                # sample every max(1, n_frames // self.n)-th frame up to n
                step = max(1, len(planes) // self.n) if self.n else 1
                take = planes[::step][: self.n] if self.n else planes
                for i, plane in enumerate(take):
                    ids.append(media_id)
                    fidx.append(i * step)
                    lumas.append(int(round(float(plane.mean()))))
                    feats.append(
                        _grid_pool(plane.astype(np.float64), IMAGE_FEATURE_DIM)
                        .astype(np.float32).tolist()
                    )
                continue
            rng = np.random.default_rng(_payload_seed(payload))
            for i in range(self.n):
                ids.append(media_id)
                fidx.append(i)
                lumas.append(int(rng.integers(0, 256)))
                feats.append(
                    rng.standard_normal(IMAGE_FEATURE_DIM).astype(np.float32).tolist()
                )
        return pa.table(
            {
                # key type follows the input column (string doc ids or ints)
                "media_id": pa.array(ids, batch.column("media_id").type),
                "frame_index": pa.array(fidx, pa.int32()),
                "mean_luma": pa.array(lumas, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


AUDIO_FEATURE_DIM = 32


class AudioFeatures:
    """Decode + fixed-window feature-extract for audio payloads (the
    torchaudio/librosa analog). Output: (media_id, duration_ms, sample_rate,
    feature: list<float>[DIM]). Same stub contract as ImageDecode: the codec
    is faked deterministically; the Ray-side plumbing is real."""

    def __init__(self, decoder: str = "fake", target_sample_rate: int = 16_000):
        self.decoder = _resolve_decoder(decoder, "audio")
        self.sr = target_sample_rate
        # real decoder state (torchaudio backend / resampler) would load HERE,
        # once per actor.

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, srs, feats = [], [], []
        for payload in batch.column("payload").to_pylist():
            if self.decoder == "real":
                # STUB: no audio codec (torchaudio/librosa) in this container.
                raise NotImplementedError("real audio decode requires torchaudio")
            if self.decoder == "numpy":
                samples, sr = decode_wav(payload)  # real decode (RIFF PCM16)
                durs.append(int(len(samples) * 1000 // sr))
                srs.append(sr)
                # fixed-window energy feature: mean |amplitude| per bucket
                buckets = np.array_split(
                    np.abs(samples.astype(np.float64)), AUDIO_FEATURE_DIM
                )
                feats.append(
                    np.array([b.mean() if len(b) else 0.0 for b in buckets],
                             np.float32).tolist()
                )
                continue
            rng = np.random.default_rng(_payload_seed(payload))
            durs.append(int(rng.integers(200, 30_000)))
            srs.append(self.sr)
            feats.append(rng.standard_normal(AUDIO_FEATURE_DIM).astype(np.float32).tolist())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "duration_ms": pa.array(durs, pa.int32()),
                "sample_rate": pa.array(srs, pa.int32()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )
