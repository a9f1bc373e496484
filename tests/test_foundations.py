"""Unit tests for L1 primitives: LCG, CRC-32, bit packing, constellations,
config profiles. These gate bit-exactness for everything above them."""

import math
import zlib

import numpy as np
import pytest

from audio_modem_tpu.configs import MODES, OFDM_PROFILES
from audio_modem_tpu.ops import bits as bits_ops
from audio_modem_tpu.ops.constellations import CONSTELLATIONS, demap, map_bits
from audio_modem_tpu.ops.crc32 import crc32, crc32_table_driven
from audio_modem_tpu.ops.lcg import js_lcg_signs, js_lcg_states, js_lcg_uniforms


class TestJsLcg:
    def test_first_states_seed_42(self):
        # s0=42 -> 42*1103515245+12345 = 46347652635 (exact, < 2^53, no
        # rounding yet); ToInt32 wraps mod 2^32 then masks to 31 bits.
        s = js_lcg_states(42, 3)
        assert s[0] == (42 * 1103515245 + 12345) % (1 << 32) & 0x7FFFFFFF
        assert s[0] == 1250496027

    def test_float64_rounding_matters(self):
        # For large states the JS product exceeds 2^53 and is rounded before
        # ToInt32 — exact-integer LCG emulation must diverge. This documents
        # the bit-exactness trap (SURVEY §2 #3).
        def exact_int_lcg(seed, n):
            out, s = [], seed
            for _ in range(n):
                s = (s * 1103515245 + 12345) % (1 << 32) & 0x7FFFFFFF
                out.append(s)
            return out

        n = 2000
        js = js_lcg_states(42, n)
        exact = exact_int_lcg(42, n)
        assert list(js) != exact, "float64 rounding should diverge from exact ints"

    def test_rounding_applied_correctly(self):
        # Each state transition must match: round-to-nearest float64 of
        # (s*1103515245 + 12345), truncated, mod 2^32, masked.
        s = js_lcg_states(43, 500)
        prev = 43
        for v in s:
            x = float(prev) * 1103515245.0 + 12345.0
            assert v == int(x) % (1 << 32) & 0x7FFFFFFF
            prev = int(v)

    def test_signs_are_pm1_and_deterministic(self):
        a = js_lcg_signs(44, 256)
        b = js_lcg_signs(44, 256)
        assert np.array_equal(a, b)
        assert set(np.unique(a)) <= {-1.0, 1.0}
        # uniform draws map to signs via > 0.5
        u = js_lcg_uniforms(44, 256)
        assert np.array_equal(a, np.where(u > 0.5, 1.0, -1.0))


class TestCrc32:
    @pytest.mark.parametrize(
        "data",
        [b"", b"a", b"123456789", bytes(range(256)), b"\x00" * 1000, np.random.default_rng(0).bytes(4096)],
    )
    def test_matches_zlib_and_table(self, data):
        assert crc32(data) == zlib.crc32(data) & 0xFFFFFFFF
        assert crc32_table_driven(data) == crc32(data)

    def test_check_value(self):
        # Standard CRC-32/IEEE check value
        assert crc32(b"123456789") == 0xCBF43926


class TestBits:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        data = rng.bytes(333)
        bits = bits_ops.bytes_to_bits(data)
        assert bits_ops.bits_to_bytes(bits) == data

    def test_msb_first(self):
        assert list(bits_ops.bytes_to_bits(b"\x80")) == [1, 0, 0, 0, 0, 0, 0, 0]
        assert list(bits_ops.bytes_to_bits(b"\x01")) == [0, 0, 0, 0, 0, 0, 0, 1]

    def test_repetition_roundtrip(self):
        rng = np.random.default_rng(2)
        bits = rng.integers(0, 2, 999)
        rep = bits_ops.repeat_bits(bits, 3)
        assert np.array_equal(bits_ops.majority_vote(rep, 3), bits)

    def test_majority_tie_rule(self):
        # sum >= n/2 -> 1 (modem.js:493): for n=2, one vote each -> 1
        assert list(bits_ops.majority_vote(np.array([1, 0, 0, 1, 0, 0]), 2)) == [1, 1, 0]

    def test_jnp_matches_numpy(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, 24 * 9)
        assert bytes(np.asarray(bits_ops.jnp_bits_to_bytes(jnp.asarray(bits)))) == bits_ops.bits_to_bytes(bits)
        assert np.array_equal(
            np.asarray(bits_ops.jnp_majority_vote(jnp.asarray(bits), 3)),
            bits_ops.majority_vote(bits, 3),
        )


class TestConstellations:
    def test_point_tables(self):
        b = CONSTELLATIONS["BPSK"].points_np()
        assert np.array_equal(b, [[1, 0], [-1, 0]])
        q = CONSTELLATIONS["QPSK"].points_np()
        s = 1 / math.sqrt(2)
        assert np.allclose(q, [[s, s], [-s, s], [-s, -s], [s, -s]])
        qam = CONSTELLATIONS["QAM16"].points_np()
        # unit average power
        assert abs((qam**2).sum(axis=1).mean() - 1.0) < 1e-12
        # Gray structure: idx0 -> (-3,-3)/sqrt(10)
        assert np.allclose(qam[0], [-3 / math.sqrt(10), -3 / math.sqrt(10)])

    @pytest.mark.parametrize("name", ["BPSK", "QPSK", "QAM16"])
    def test_map_demap_roundtrip(self, name):
        import jax.numpy as jnp

        c = CONSTELLATIONS[name]
        rng = np.random.default_rng(4)
        bits = rng.integers(0, 2, (3, 64 * c.bps))
        re, im = map_bits(name, jnp.asarray(bits))
        out = demap(name, re, im)
        assert np.array_equal(np.asarray(out), bits)

    @pytest.mark.parametrize("name", ["BPSK", "QPSK", "QAM16"])
    def test_demap_with_noise(self, name):
        import jax.numpy as jnp

        c = CONSTELLATIONS[name]
        rng = np.random.default_rng(5)
        bits = rng.integers(0, 2, (1, 256 * c.bps))
        re, im = map_bits(name, jnp.asarray(bits))
        # noise well inside decision regions
        re = re + 0.05 * rng.standard_normal(re.shape)
        im = im + 0.05 * rng.standard_normal(im.shape)
        out = demap(name, jnp.asarray(re), jnp.asarray(im))
        assert np.array_equal(np.asarray(out), bits)


class TestProfiles:
    def test_data_subcarrier_counts(self):
        # SURVEY §6: standard 205, acoustic 64, narrowband 21
        assert OFDM_PROFILES["standard"].num_data_subs == 205
        assert OFDM_PROFILES["acoustic"].num_data_subs == 64
        assert OFDM_PROFILES["narrowband"].num_data_subs == 21

    def test_symbol_lengths(self):
        assert OFDM_PROFILES["standard"].symbol_len == 576
        assert OFDM_PROFILES["acoustic"].symbol_len == 640
        assert OFDM_PROFILES["narrowband"].symbol_len == 768

    def test_preamble_waveforms(self):
        for p in OFDM_PROFILES.values():
            for wf in (p.preamble1, p.preamble2, p.ce_symbol):
                assert wf.dtype == np.float32
                assert len(wf) == p.symbol_len
                assert np.abs(wf).max() > 0
            # Schmidl-Cox: preamble1 halves are (anti)periodic after the CP
            body = p.preamble1[p.cp_len :].astype(np.float64)
            a, b = body[:256], body[256:]
            r = (a @ b) ** 2 / ((a @ a) * (b @ b))
            assert r > 0.999, f"{p.name}: halves not correlated (r^2={r})"

    def test_mode_registry(self):
        assert MODES["QPSK"].profile_name == "standard" and MODES["QPSK"].repetition == 1
        assert MODES["16-QAM"].chunk_size == 4096
        assert MODES["BPSK-REPEAT"].repetition == 3
        assert MODES["BPSK-NARROW"].profile_name == "narrowband"
        assert MODES["QPSK"].chunk_size == 2048
        assert MODES["BPSK-ACOUSTIC"].chunk_size == 512
