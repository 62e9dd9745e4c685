"""Property-based pins of the pure-Python media codecs (hypothesis):
encode→decode must be the identity on the raster/PCM payload for ANY
dimensions and byte content — the invariant the oracle-gated
multimodal queries stand on. Pure Python (no Spark job per example),
so the example budget can be generous.
"""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from ecommerce_realtime_pipeline_spark.operators import multimodal as MM

DIMS = st.tuples(st.integers(1, 12), st.integers(1, 10))


@given(DIMS, st.randoms())
@settings(max_examples=60, deadline=None)
def test_ppm_bmp_roundtrip_any_dims(dims, rnd):
    w, h = dims
    rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    assert MM.decode_image(MM.encode_ppm(w, h, rgb)) == ("ppm", w, h, rgb)
    assert MM.decode_image(MM.encode_bmp(w, h, rgb)) == ("bmp", w, h, rgb)


@given(
    st.integers(1, 2),
    st.sampled_from([8000, 16000, 44100]),
    st.lists(st.integers(-32768, 32767), min_size=2, max_size=64),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_any_samples(channels, rate, samples):
    if len(samples) % channels:
        samples = samples[: len(samples) - 1]
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    got = MM.decode_audio(MM.encode_wav(channels, rate, pcm))
    assert got == (channels, rate, len(samples) // channels, samples)


@given(DIMS, st.integers(1, 6), st.integers(1, 6), st.randoms())
@settings(max_examples=40, deadline=None)
def test_resize_grid_is_exact_sampling(dims, ow, oh, rnd):
    """nn_resample (the resize_image inner step) must pick exactly
    source pixel (r·h//oh, c·w//ow) for every output position, for any
    (in, out) shape combination — including upscales and no-ops —
    and survive a BMP decode round-trip unchanged."""
    w, h = dims
    rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    _fmt, dw, dh, decoded = MM.decode_image(MM.encode_bmp(w, h, rgb))
    assert decoded == rgb
    got = MM.nn_resample(decoded, w, h, ow, oh)
    expect = bytearray()
    for r in range(oh):
        sy = r * h // oh
        for c in range(ow):
            sx = c * w // ow
            si = (sy * w + sx) * 3
            expect += rgb[si : si + 3]
    assert got == bytes(expect)
    if (ow, oh) == (w, h):
        assert got == rgb  # identity resize is a no-op


@given(
    st.integers(1, 2),
    st.integers(1, 40),
    st.integers(1, 4),
    st.randoms(),
)
@settings(max_examples=60, deadline=None)
def test_wav_decimate_roundtrip(channels, frames, factor, rnd):
    """decode(encode(decimate(decode(wav)))) must equal the direct
    frame slice for ANY channel count / frame count / factor — the
    invariant mm_audio_decimate_stats stands on."""
    samples = [rnd.randrange(-32768, 32768) for _ in range(frames * channels)]
    pcm = b"".join(struct.pack("<h", v) for v in samples)
    wav = MM.encode_wav(channels, 8000, pcm)
    ch, rate, fr, dec = MM.decode_audio(wav)
    assert (ch, rate, fr, dec) == (channels, 8000, frames, samples)
    kept = MM.decimate_samples(dec, ch, fr, factor)
    out = MM.encode_wav(ch, rate // factor, b"".join(struct.pack("<h", v) for v in kept))
    ch2, rate2, fr2, dec2 = MM.decode_audio(out)
    expect = [s for f in range(0, frames, factor) for s in samples[f * channels : (f + 1) * channels]]
    assert dec2 == expect
    assert fr2 == len(expect) // channels and ch2 == channels
    assert rate2 == rate // factor
