"""Property-based laws (hypothesis) for the dependency-free media codecs.

These are the invariants the mapInPandas feature extractor relies on at
ingest scale: encode->decode roundtrips are exact for every representable
input, the statistics laws equal their numpy definitions, and the decoders
are TOTAL over arbitrary byte strings (untrusted web content must never
fail an Arrow batch). Pure-Python properties -- no SparkSession needed, so
hypothesis can drive many examples cheaply.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crocodile_spark.operators.multimodal import (
    _gif_lzw_decode,
    decode_gif_pixels,
    decode_png_pixels,
    encode_gif_pixels,
    encode_png_pixels,
    encode_wav,
    media_content_stats,
    media_feature,
    parse_media_header,
)

_SETTINGS = settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def _png_case(draw):
    color_type = draw(st.sampled_from([0, 2, 4, 6]))
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    w = draw(st.integers(1, 12))
    h = draw(st.integers(1, 12))
    data = draw(
        st.binary(min_size=h * w * nch, max_size=h * w * nch).map(
            lambda b: np.frombuffer(b, np.uint8).reshape(h, w * nch)
        )
    )
    return color_type, data


@_SETTINGS
@given(_png_case())
def test_png_roundtrip_is_exact(case):
    color_type, px = case
    payload = encode_png_pixels(px, color_type=color_type)
    out = decode_png_pixels(payload)
    assert out is not None and np.array_equal(out, px)
    fmt, w, h, nch = parse_media_header(payload)
    assert fmt == "png" and (h, w * nch) == px.shape


@_SETTINGS
@given(
    st.integers(1, 10),
    st.integers(1, 10),
    st.binary(min_size=768, max_size=768),
    st.binary(min_size=100, max_size=100),
)
def test_gif_roundtrip_is_exact(w, h, pal_bytes, idx_bytes):
    palette = np.frombuffer(pal_bytes, np.uint8).reshape(256, 3)
    indices = np.frombuffer(idx_bytes[: w * h], np.uint8)
    if len(indices) < w * h:
        indices = np.resize(indices, w * h)
    indices = indices.reshape(h, w)
    payload = encode_gif_pixels(indices, palette)
    out = decode_gif_pixels(payload)
    expected = palette[indices.reshape(-1)].reshape(h, w * 3)
    assert out is not None and np.array_equal(out, expected)


@_SETTINGS
@given(st.integers(1, 4), st.binary(min_size=2, max_size=600))
def test_wav_stats_equal_numpy_definition(channels, data):
    payload = encode_wav(channels, 16000, data)
    means, stds = media_content_stats(payload)
    smp = np.frombuffer(data, "<i2", count=len(data) // 2).astype(np.float64)
    n = (len(smp) // channels) * channels
    if n == 0:
        assert means is None and stds is None
        return
    chans = smp[:n].reshape(-1, channels)
    assert means == pytest.approx(list(chans.mean(axis=0) / 32768.0), abs=1e-12)
    assert stds == pytest.approx(list(chans.std(axis=0) / 32768.0), abs=1e-12)


@_SETTINGS
@given(st.binary(max_size=400), st.integers(0, 13))
def test_lzw_decode_is_total(data, min_code_size):
    out = _gif_lzw_decode(data, min_code_size)
    assert out is None or isinstance(out, bytes)


@_SETTINGS
@given(st.binary(max_size=300))
def test_media_pipeline_total_on_arbitrary_bytes(payload):
    parse_media_header(payload)
    m, s = media_content_stats(payload)
    assert (m is None) == (s is None)
    assert len(media_feature(payload)) == 8
