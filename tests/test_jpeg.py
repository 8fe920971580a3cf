"""Pure-numpy baseline JPEG codec (functions/jpeg.py): round trips across
the full decode envelope (4:4:4 / 4:2:0, restart intervals, grayscale,
non-multiple-of-8 sizes), spec-compliance details (zigzag DQT, byte
stuffing), fail-loudly rejections, and the multimodal auto-probe wiring."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from clickhouse_data_pipeline_ray.functions.jpeg import (
    QUANT_LUMA,
    ZIGZAG,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 255 / h), (xx * 255 / w), ((yy + xx) * 255 / (h + w))], axis=-1
    ).astype(np.uint8)


def test_flat_color_roundtrips_exactly():
    flat = np.full((16, 24, 3), 77, np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(flat, 85))
    assert out.shape == (16, 24, 3)
    assert int(np.abs(out.astype(int) - 77).max()) == 0


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"subsample": True},
        {"restart_interval": 2},
        {"subsample": True, "restart_interval": 1},
    ],
    ids=["444", "420", "444+rst", "420+rst"],
)
def test_gradient_roundtrip_within_quant_error(kwargs):
    img = _gradient(40, 56)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, 90, **kwargs))
    assert out.shape == img.shape
    err = np.abs(out.astype(float) - img)
    assert err.mean() < 3.0 and err.max() < 20, (err.mean(), err.max())


def test_noise_roundtrip_q95():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, 95))
    assert np.mean(np.abs(out.astype(float) - img)) < 8.0


def test_odd_dimensions_and_grayscale():
    rng = np.random.default_rng(6)
    odd = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    assert decode_jpeg_baseline(encode_jpeg_baseline(odd, 90)).shape == (13, 21, 3)
    assert decode_jpeg_baseline(
        encode_jpeg_baseline(odd, 90, subsample=True)
    ).shape == (13, 21, 3)
    g = _gradient(19, 9)[:, :, 0]
    out = decode_jpeg_baseline(encode_jpeg_baseline(g, 92))
    assert out.shape == (19, 9, 3)  # grayscale replicated to 3 channels
    assert np.abs(out[:, :, 0].astype(float) - g).mean() < 3.0


def test_dqt_is_zigzag_ordered():
    """The DQT segment must carry the table in zigzag order (T.81 B.2.4.1)
    — a natural-order writer round-trips against itself but breaks against
    any conforming decoder."""
    payload = encode_jpeg_baseline(np.zeros((8, 8, 3), np.uint8), quality=50)
    pos = payload.index(b"\xFF\xDB")
    body = payload[pos + 5 : pos + 5 + 64]  # skip marker+len+Pq/Tq byte
    got = np.frombuffer(body, np.uint8).astype(np.int64)
    # quality 50 = the Annex K table unscaled
    assert np.array_equal(got, QUANT_LUMA[ZIGZAG])


def test_byte_stuffing_roundtrip():
    """An image tuned to emit 0xFF bytes in the entropy stream must decode
    through the 0xFF00 unstuffing path."""
    rng = np.random.default_rng(7)
    for seed in range(4):
        img = np.random.default_rng(seed).integers(
            0, 256, (32, 32, 3), dtype=np.uint8
        )
        pay = encode_jpeg_baseline(img, 97)
        scan = pay[pay.index(b"\xFF\xDA") :]
        if b"\xFF\x00" in scan:
            out = decode_jpeg_baseline(pay)
            assert np.mean(np.abs(out.astype(float) - img)) < 8.0
            return
    pytest.fail("no test image produced a stuffed byte")


def test_rejects_progressive_and_garbage():
    img = _gradient(16, 16)
    pay = bytearray(encode_jpeg_baseline(img, 85))
    sof = pay.index(b"\xFF\xC0")
    pay[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_baseline(bytes(pay))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"BM notajpeg")


def test_restart_markers_present_and_consumed():
    img = _gradient(48, 48)
    pay = encode_jpeg_baseline(img, 90, restart_interval=2)
    assert b"\xFF\xDD" in pay  # DRI segment
    scan = pay[pay.index(b"\xFF\xDA") :]
    assert any(bytes([0xFF, 0xD0 + i]) in scan for i in range(8))
    out = decode_jpeg_baseline(pay)
    assert np.abs(out.astype(float) - img).mean() < 3.0


def test_image_decode_stage_dispatches_jpeg(ray_session):
    """ImageDecode's numpy tier decodes JPEG payloads by magic: the 64-dim
    grid-pool feature of a planted flat JPEG must equal the flat color (the
    feature is derived from REAL decoded pixels, not payload hashes)."""
    from clickhouse_data_pipeline_ray.functions.multimodal import ImageDecode

    img = np.full((24, 40, 3), 130, np.uint8)
    batch = pa.table(
        {
            "media_id": pa.array(["j1", "b1"]),
            "mime": pa.array(["image/jpeg", "image/bmp"]),
            "payload": pa.array(
                [
                    encode_jpeg_baseline(img, 92),
                    __import__(
                        "clickhouse_data_pipeline_ray.functions.multimodal",
                        fromlist=["encode_bmp"],
                    ).encode_bmp(img),
                ],
                pa.binary(),
            ),
        }
    )
    out = ImageDecode(decoder="numpy")(batch)
    assert out.column("height").to_pylist() == [24, 24]
    assert out.column("width").to_pylist() == [40, 40]
    feats = out.column("feature").to_pylist()
    assert np.allclose(feats[0], 130.0, atol=2.0)  # JPEG: quantization slack
    assert np.allclose(feats[1], 130.0)            # BMP: exact
