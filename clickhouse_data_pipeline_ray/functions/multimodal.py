"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a mime/meta sidecar;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages (model/codec state loaded once per actor, small batch
sizes because payload bytes dominate block size).

The decode libraries (PIL/ffmpeg/torchaudio) are NOT available in this
container, so the codec step is STUBBED: ``decoder="fake"`` produces
deterministic, hash-seeded outputs with the real output schema, and
``decoder="real"`` raises ``NotImplementedError`` at the clearly marked
point. ``decoder="auto"`` (self-upgrading) probes the codec library at actor
init — once per actor, never per batch — and selects "real" when the library
is importable, "fake" otherwise, with the output schema identical either
way. Everything Ray-side — schema, batch sizing, actor signature, output
layout — is real and tested (tests/test_similarity_multimodal.py).
"""

from __future__ import annotations

import importlib.util
import shutil as _shutil

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
    """'auto' → 'real' iff the codec library is present, else 'fake'."""
    if requested not in ("fake", "real", "auto"):
        raise ValueError(requested)
    if requested == "auto":
        return "real" if _codec_available(kind) else "fake"
    return requested

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
        ids, fidx, feats = [], [], []
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            if self.decoder == "real":
                # STUB: no video codec (ffmpeg) in this environment.
                raise NotImplementedError("real frame sampling requires ffmpeg")
            rng = np.random.default_rng(_payload_seed(payload))
            for i in range(self.n):
                ids.append(media_id)
                fidx.append(i)
                feats.append(
                    rng.standard_normal(IMAGE_FEATURE_DIM).astype(np.float32).tolist()
                )
        return pa.table(
            {
                # key type follows the input column (string doc ids or ints)
                "media_id": pa.array(ids, batch.column("media_id").type),
                "frame_index": pa.array(fidx, pa.int32()),
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
