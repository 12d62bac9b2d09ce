"""FLAC codec (llm/flac.py): property roundtrips across subframe types,
stereo decorrelation modes and Rice partitioning; STREAMINFO-MD5 and
CRC integrity checks; audit integration; ValueError-only fuzz."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.audio_containers import flac_audit, sniff_audio
from hdp2_5_hive2_spark.llm.flac import flac_decode, flac_encode


def _sig(n, seed, amp=5000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (amp * np.sin(t / 40) + rng.integers(-300, 300, n)).astype(np.int16)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 4000),
    order=st.integers(0, 4),
    po=st.integers(0, 3),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    seed=st.integers(0, 2**31),
)
def test_mono_property_roundtrip(n, order, po, rate, seed):
    sig = _sig(n, seed)
    data = flac_encode(sig, rate=rate, fixed_order=order,
                       blocksize=1024, partition_order=po)
    back, r = flac_decode(data)
    assert r == rate and np.array_equal(back, sig.astype(np.int32))


@settings(max_examples=15, deadline=None)
@given(mode=st.sampled_from(["indep", "ls", "rs", "ms"]), seed=st.integers(0, 2**31))
def test_stereo_decorrelation_modes(mode, seed):
    left = _sig(3000, seed)
    right = (left // 2 + _sig(3000, seed + 1, amp=100)).astype(np.int16)
    both = np.stack([left, right], axis=1)
    back, _ = flac_decode(flac_encode(both, stereo_mode=mode))
    assert back.shape == (3000, 2) and np.array_equal(back, both.astype(np.int32))


def test_lpc_subframes_and_compression():
    sig = _sig(5000, 7)
    lpc = flac_encode(sig, lpc=([2 << 12, -(1 << 12)], 12))
    back, _ = flac_decode(lpc)
    assert np.array_equal(back, sig.astype(np.int32))
    # the point of predictors: tonal signals compress below raw PCM
    assert len(lpc) < sig.nbytes
    assert len(flac_encode(sig, fixed_order=1)) < sig.nbytes


def test_integrity_checks_catch_corruption():
    sig = _sig(4000, 3)
    data = flac_encode(sig)
    # payload bit flip deep in the last frame → CRC-16 or MD5 catches it
    bad = bytearray(data)
    bad[-10] ^= 0x40
    with pytest.raises(ValueError, match="CRC-16|MD5"):
        flac_decode(bytes(bad))
    # header corruption → CRC-8
    hdr_at = data.index(b"\xff\xf8", 50)
    bad2 = bytearray(data)
    bad2[hdr_at + 2] ^= 0x10
    with pytest.raises(ValueError, match="CRC-8|corrupt|sync"):
        flac_decode(bytes(bad2))


def test_audit_and_sniff_agree_with_codec():
    sig = _sig(32000, 5)
    data = flac_encode(sig, rate=16000)
    assert sniff_audio(data) == "flac"
    a = flac_audit(data)
    assert (a.sample_rate, a.channels, a.duration_ms) == (16000, 1, 2000)
    assert a.extra["total_samples"] == 32000


@settings(max_examples=150, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 8), cut=st.floats(0.05, 1.0))
def test_fuzz_only_valueerror(seed, n_mut, cut):
    import random as _random

    rnd = _random.Random(seed)
    data = bytearray(flac_encode(_sig(600, 11), blocksize=256))
    for _ in range(n_mut):
        data[rnd.randrange(len(data))] = rnd.randrange(256)
    blob = bytes(data)[: max(8, int(len(data) * cut))]
    try:
        flac_decode(blob)
    except ValueError:
        pass
