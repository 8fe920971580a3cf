"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a mime/meta sidecar;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages (model/codec state loaded once per actor, small batch
sizes because payload bytes dominate block size).

The decode libraries (PIL/ffmpeg/torchaudio) are NOT available in this
container, so the codec step is STUBBED: ``decoder="fake"`` produces
deterministic, hash-seeded outputs with the real output schema, and
``decoder="real"`` raises ``NotImplementedError`` at the clearly marked
point. Everything Ray-side — schema, batch sizing, actor signature, output
layout — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.resize_to = resize_to
        # real decoder state (e.g. a PIL import / model handle) would be
        # created HERE, once per actor.

    def _decode_one(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        if self.decoder == "real":
            # STUB: no image codec available in this environment.
            raise NotImplementedError(
                "real image decoding requires PIL/opencv, not present in this container"
            )
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
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
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
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
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
