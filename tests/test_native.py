"""Native C++ host runtime: correctness vs the pure-python references."""

import zlib

import numpy as np
import pytest

from audio_modem_tpu import native


def test_library_compiles():
    assert native.available(), "g++ toolchain present in this image; native lib must build"


def test_crc32_matches_zlib():
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 8, 9, 255, 4096, 70001):
        data = rng.bytes(n)
        assert native.crc32(data) == zlib.crc32(data) & 0xFFFFFFFF


def test_ema_matches_scalar_reference():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(10000).astype(np.float32) + 0.05  # with DC
    # scalar JS-faithful reference
    dc, ref = 0.0, np.empty_like(x)
    a = 0.999
    for i, v in enumerate(x.astype(np.float64)):
        dc = a * dc + (1 - a) * v
        ref[i] = v - dc
    got, state = native.ema_dc_removal(x, a, 0.0)
    assert np.abs(got - ref).max() < 1e-6
    assert abs(state - dc) < 1e-12
    # continuation across blocks must equal one long run
    g1, s1 = native.ema_dc_removal(x[:3000], a, 0.0)
    g2, s2 = native.ema_dc_removal(x[3000:], a, s1)
    assert np.abs(np.concatenate([g1, g2]) - got).max() < 1e-6


def test_majority_vote_tie_rule():
    bits = np.array([1, 0, 0, 1, 0, 0, 1, 1], dtype=np.int8)
    assert list(native.majority_vote(bits, 2)) == [1, 1, 0, 1]


def test_fallback_paths_match():
    """Force the numpy fallbacks and compare with native outputs."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal(5000).astype(np.float32)
    lib = native._lib
    try:
        native._lib, native._tried = None, True
        fb, fb_state = native.ema_dc_removal(x, 0.999, 0.1)
        fb_crc = native.crc32(b"hello world")
        fb_mv = native.majority_vote(np.array([1, 1, 0, 0, 0, 1], np.int8), 3)
    finally:
        native._lib = lib
    nt, nt_state = native.ema_dc_removal(x, 0.999, 0.1)
    assert np.abs(fb - nt).max() < 1e-5
    assert abs(fb_state - nt_state) < 1e-9
    assert fb_crc == native.crc32(b"hello world")
    assert np.array_equal(fb_mv, native.majority_vote(np.array([1, 1, 0, 0, 0, 1], np.int8), 3))
