"""Encoder property suite (r15, VERDICT r14 #7): every multimodal ENCODER
either raises ValueError on out-of-domain input or emits bytes its OWN
decoder accepts — never a payload the decoder rejects or mis-shapes.

The r14 deep mutation fuzz covered the DECODE paths (9 payload kinds,
>=10k mutations each); this suite closes the other direction with
adversarial parameters: JPEG quality extremes and odd rasters, 420
subsampling with non-multiple-of-16 dims, restart intervals, ADPCM
block-size extremes against the groups_per_block guard, multi-channel
audio, 1-frame and many-frame AVIs under frame_stride, and 1x1 rasters
everywhere. Lossless codecs additionally round-trip bit-exactly.

Pure functions — no Spark session, so examples are cheap; the budget is
higher than the Spark-backed property suite.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyranges_1_x_spark.ml.jpeg import decode_jpeg, encode_jpeg
from pyranges_1_x_spark.ml.multimodal import (
    decode_adpcm_wav,
    decode_avi,
    decode_bmp,
    decode_netpbm,
    decode_png,
    decode_wav,
    encode_adpcm_wav,
    encode_avi,
    encode_bmp,
    encode_netpbm,
    encode_png,
    encode_wav,
)

_EXPLORE = int(__import__("os").environ.get("SPARK_GRAFT_HYP_EXPLORE", "0"))

_SETTINGS = settings(
    max_examples=_EXPLORE or 25,
    deadline=None,
    derandomize=not _EXPLORE,
    suppress_health_check=[HealthCheck.too_slow],
)

_dims = st.integers(min_value=1, max_value=21)


def _raster(h, w, c, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return a[:, :, 0] if c == 1 and seed % 2 else a  # exercise 2-D input too


@given(h=_dims, w=_dims, c=st.sampled_from([1, 3]), seed=st.integers(0, 2**16))
@_SETTINGS
def test_bmp_roundtrip_property(h, w, c, seed):
    a = _raster(h, w, c, seed)
    out = decode_bmp(encode_bmp(a))
    assert out is not None
    assert out.shape == (h, w, c)
    assert np.array_equal(out.reshape(h, w, c), a.reshape(h, w, c))


@given(h=_dims, w=_dims, c=st.sampled_from([1, 2, 3, 4]), seed=st.integers(0, 2**16))
@_SETTINGS
def test_png_roundtrip_property(h, w, c, seed):
    a = _raster(h, w, c, seed)
    out = decode_png(encode_png(a))
    assert out is not None
    assert out.shape == (h, w, c)
    assert np.array_equal(out.reshape(h, w, c), a.reshape(h, w, c))


@given(h=_dims, w=_dims, c=st.sampled_from([1, 3]), seed=st.integers(0, 2**16))
@_SETTINGS
def test_netpbm_roundtrip_property(h, w, c, seed):
    a = _raster(h, w, c, seed)
    out = decode_netpbm(encode_netpbm(a))
    assert out is not None
    assert out.shape == (h, w, c)
    assert np.array_equal(out.reshape(h, w, c), a.reshape(h, w, c))


@given(
    h=_dims,
    w=_dims,
    c=st.sampled_from([1, 3]),
    quality=st.sampled_from([1, 5, 50, 95, 100]),
    subsampling=st.sampled_from(["444", "420"]),
    restart=st.sampled_from([0, 1, 3]),
    seed=st.integers(0, 2**16),
)
@_SETTINGS
def test_jpeg_encoder_emits_self_decodable(h, w, c, quality, subsampling, restart, seed):
    """Lossy: the property is acceptance + exact raster geometry, not
    values. Quality extremes (1, 100), both subsamplings on rasters far
    from multiples of 8/16, and restart markers every 1 MCU."""
    a = _raster(h, w, c, seed).reshape(h, w, c)
    payload = encode_jpeg(
        a, quality=quality, subsampling=subsampling, restart_interval=restart
    )
    out = decode_jpeg(payload)
    assert out is not None
    assert out.shape == (h, w, c)
    assert out.dtype == np.uint8


@given(
    n=st.integers(min_value=0, max_value=700),
    ch=st.sampled_from([1, 2, 3]),
    rate=st.sampled_from([1, 8000, 48000, 192000]),
    seed=st.integers(0, 2**16),
)
@_SETTINGS
def test_wav_roundtrip_property(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-1, 1, size=(n, ch))
    if n and seed % 2 and ch == 1:
        a = a[:, 0]  # exercise 1-D mono input
    payload = encode_wav(a, sample_rate=rate)
    got = decode_wav(payload)
    assert got is not None
    samples, got_rate = got
    assert got_rate == rate
    assert samples.shape == (n, ch)
    # lossless up to the int16 quantization the encoder itself applies
    q = np.clip(np.round(np.asarray(a, dtype=np.float64).reshape(n, ch) * 32768.0),
                -32768, 32767) / 32768.0
    assert np.allclose(samples, q, atol=1 / 32768.0)


@given(
    n=st.integers(min_value=1, max_value=1200),
    ch=st.sampled_from([1, 2]),
    gpb=st.sampled_from([1, 2, 63, 255]),
    seed=st.integers(0, 2**16),
)
@_SETTINGS
def test_adpcm_encoder_emits_self_decodable(n, ch, gpb, seed):
    """Lossy: acceptance + duration. The encoder writes a fact chunk with
    the true frame count and the decoder trims the block padding to it, so
    the decoded shape is exactly the input's; rate and channels survive."""
    rng = np.random.default_rng(seed)
    a = rng.uniform(-1, 1, size=(n, ch))
    payload = encode_adpcm_wav(a, sample_rate=8000, groups_per_block=gpb)
    got = decode_adpcm_wav(payload)
    assert got is not None
    samples, rate = got
    assert rate == 8000
    assert samples.shape == (n, ch)


def test_adpcm_encoder_rejects_bad_block_size():
    with pytest.raises(ValueError, match="groups_per_block"):
        encode_adpcm_wav(np.zeros(8), groups_per_block=0)
    with pytest.raises(ValueError, match="groups_per_block"):
        encode_adpcm_wav(np.zeros(8), groups_per_block=-3)


@given(
    n=st.integers(min_value=1, max_value=7),
    h=st.sampled_from([1, 5, 16]),
    w=st.sampled_from([1, 6, 16]),
    c=st.sampled_from([1, 3]),
    codec=st.sampled_from(["DIB", "MJPG"]),
    stride=st.sampled_from([1, 2, 5]),
    seed=st.integers(0, 2**16),
)
@_SETTINGS
def test_avi_encoder_emits_self_decodable(n, h, w, c, codec, stride, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w, c), dtype=np.uint8)
    payload = encode_avi(frames, fps=10, codec=codec)
    got = decode_avi(payload, frame_stride=stride)
    assert got is not None
    out, fps = got
    assert fps == 10
    kept = -(-n // stride)  # frames 0, stride, 2*stride, ...
    assert out.shape[0] == kept
    assert out.shape[1:3] == (h, w)
    if codec == "DIB":
        # uncompressed: strided frames round-trip bit-exactly
        assert np.array_equal(
            out.reshape(kept, h, w, -1)[..., :c], frames[::stride]
        )


def test_encoders_reject_empty_rasters():
    empty = np.zeros((0, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_avi(empty[None, ...][0:0])  # zero frames
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))  # 2 channels
    with pytest.raises(ValueError):
        encode_avi(np.zeros((1, 2, 2, 4), dtype=np.uint8))  # 4 channels
