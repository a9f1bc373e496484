"""Reed-Solomon FEC extension: codec properties + end-to-end over noisy
channels where CRC-only decoding fails."""

import numpy as np
import pytest

from audio_modem_tpu import api, channel, framing
from audio_modem_tpu.configs import MODES
from audio_modem_tpu.ops import rs


class TestRsCodec:
    def test_clean_roundtrip(self):
        data = np.random.default_rng(0).bytes(223)
        coded = rs.rs_encode(data)
        assert len(coded) == 255
        dec, c = rs.rs_decode(coded)
        assert dec == data and c == 0

    def test_corrects_up_to_16_errors(self):
        rng = np.random.default_rng(1)
        data = rng.bytes(223)
        coded = bytearray(rs.rs_encode(data))
        pos = rng.choice(255, 16, replace=False)
        for p in pos:
            coded[p] ^= int(rng.integers(1, 256))
        dec, c = rs.rs_decode(bytes(coded))
        assert dec == data and c == 16

    def test_rejects_17_errors(self):
        rng = np.random.default_rng(2)
        data = rng.bytes(223)
        coded = bytearray(rs.rs_encode(data))
        for p in rng.choice(255, 17, replace=False):
            coded[p] ^= int(rng.integers(1, 256))
        with pytest.raises(ValueError):
            rs.rs_decode(bytes(coded))

    def test_shortened_and_multiblock_fuzz(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            data = rng.bytes(int(rng.integers(1, 700)))
            coded = bytearray(rs.rs_encode(data))
            nerr = int(rng.integers(0, 8))
            for p in rng.choice(len(coded), nerr, replace=False):
                coded[p] ^= int(rng.integers(1, 256))
            dec, _ = rs.rs_decode(bytes(coded))
            assert dec == data

    def test_wire_length_helper(self):
        assert framing.fec_coded_len(223) == 255
        assert framing.fec_coded_len(224) == 224 + 64
        assert framing.fec_wire_len(100) == 5 + 132

    def test_known_answer_literal_pin(self):
        """Literal pin of the code itself (not just self-consistent
        round-trips): field poly 0x11D, alpha=2, fcr=0, systematic
        RS(255,223). Any change to the generator polynomial, table
        construction, or vectorized remainder silently survives every
        round-trip test in this file but breaks wire compatibility with
        already-recorded FEC transmissions — this pin catches it.
        Values generated once by ops/rs.py at the time of pinning and
        cross-checked by the independent schoolbook encoder below."""
        coded = bytes(rs.rs_encode(bytes(range(223))))
        assert coded[:223] == bytes(range(223))  # systematic
        assert coded[223:].hex() == (
            "41841183b11fdb537421939696cda70e"
            "1db5c86684af222564b89cc6069f172e"
        )
        short = bytes(rs.rs_encode(b"audio_modem_tpu"))  # shortened codeword
        assert short.hex() == (
            "617564696f5f6d6f64656d5f7470756de5688e01e15758405a3e7a53260248e6"
            "243d7e4382e81a13d98d4cc984067b"
        )

    def test_matches_independent_schoolbook_encoder(self):
        """Cross-check the vectorized numpy codec against a from-scratch
        scalar GF(256) polynomial-division encoder implementing the same
        declared convention (0x11D, alpha=2, fcr=0). Shared nothing with
        ops/rs.py except the spec."""
        exp, log = [0] * 512, [0] * 256
        x = 1
        for i in range(255):
            exp[i] = x
            log[x] = i
            x <<= 1
            if x & 0x100:
                x ^= 0x11D
        exp[255:510] = exp[:255]

        def mul(a, b):
            return 0 if 0 in (a, b) else exp[log[a] + log[b]]

        gen = [1]
        for i in range(32):  # g(x) = prod (x - alpha^i), fcr=0
            gen = [
                (gen[j] if j < len(gen) else 0) ^ mul(gen[j - 1] if j else 0, exp[i])
                for j in range(len(gen) + 1)
            ]
        rng = np.random.default_rng(29)
        for k in (223, 100, 1):  # full + shortened codewords
            data = rng.bytes(k)
            rem = [0] * 32
            for byte in data:  # synthetic LFSR division
                feedback = byte ^ rem[0]
                rem = rem[1:] + [0]
                if feedback:
                    for j in range(32):
                        rem[j] ^= mul(gen[j + 1], feedback)
            assert bytes(rs.rs_encode(data)) == data + bytes(rem)


class TestFecFraming:
    def test_wrap_parse_roundtrip(self):
        payload = framing.build_data_chunk_payload(b"hello world" * 10, 3)
        wrapped = framing.wrap_fec(payload)
        assert wrapped[0] == 0xFD
        res = framing.parse_payload_bytes(wrapped + b"\x00" * 37)  # junk tail
        assert isinstance(res, framing.DataFrame)
        assert res.crc_valid and res.seq_num == 3 and res.fec_corrected == 0

    def test_byte_corruption_corrected(self):
        payload = framing.build_legacy_payload(b"x" * 300, "f.bin")
        wrapped = bytearray(framing.wrap_fec(payload))
        for p in (10, 50, 200, 300):
            wrapped[p] ^= 0xA5
        res = framing.parse_payload_bytes(bytes(wrapped))
        assert isinstance(res, framing.LegacyFrame)
        assert res.crc_valid and res.data == b"x" * 300
        assert res.fec_corrected == 4


class TestFecMisparseMasking:
    """A corrupted FEC frame must surface as an FEC failure, never be masked
    by the 0xFD legacy fallback structurally parsing noise. Regression: the
    fallback used to accept any structural legacy parse (0xFD = name_len 253,
    dlen read from corrupted bytes), returning a garbage crc-invalid
    LegacyFrame that blocked decode_signal's errors-and-erasures retry rung."""

    def test_fallback_requires_valid_crc(self):
        rng = np.random.default_rng(23)
        payload = framing.build_legacy_payload(rng.bytes(400), "m.bin")
        wrapped = bytearray(framing.wrap_fec(payload))
        for p in range(40, len(wrapped), 3):  # far beyond RS capacity
            wrapped[p] ^= 0x7F
        # make the legacy fallback parse *structurally*: dlen small, in-range
        wrapped[254:258] = (10).to_bytes(4, "big")
        res = framing.parse_payload_bytes(bytes(wrapped))
        assert isinstance(res, framing.FrameError), res
        assert res.error.startswith("FEC decode failed")

    def test_is_fec_failure_covers_miscorrection(self):
        """An RS mis-correction parses the inner payload but fails its CRC;
        the decoder must still treat that as an FEC failure so the erasure
        retry gets a chance."""
        from audio_modem_tpu import decoder

        raw = bytes([0xFD]) + b"\x00\x00\x00\x08" + b"x" * 16
        garbage = framing.LegacyFrame("g", b"y", False, 1, 2)
        assert decoder._is_fec_failure(raw, garbage)
        assert decoder._is_fec_failure(raw, framing.FrameError("FEC decode failed: x"))
        assert decoder._is_fec_failure(raw, framing.FrameError("Decoded data too short"))
        ok = framing.LegacyFrame("g", b"y", True, 1, 1)
        assert not decoder._is_fec_failure(raw, ok)
        assert not decoder._is_fec_failure(b"\x00" + raw[1:], garbage)


class TestFecEndToEnd:
    def test_legacy_fec_beats_crc_under_noise(self):
        """At an SNR causing scattered symbol errors, the plain frame fails
        CRC while the FEC frame decodes perfectly."""
        mode = MODES["16-QAM"]
        data = np.random.default_rng(5).bytes(1500)
        spec = channel.ChannelSpec(snr_db=14.5)

        plain = api.encode_legacy(data, mode, "p.bin")
        plain_rx = channel.apply_channel_np(plain, spec, seed=11)
        plain_res, _ = api.decode(plain_rx, mode)
        plain_ok = isinstance(plain_res, framing.LegacyFrame) and plain_res.crc_valid

        fec_sig = api.encode_legacy(data, mode, "p.bin", fec=True)
        fec_rx = channel.apply_channel_np(fec_sig, spec, seed=11)
        fec_res, _ = api.decode(fec_rx, mode)
        assert isinstance(fec_res, framing.LegacyFrame), getattr(fec_res, "error", fec_res)
        assert fec_res.crc_valid and fec_res.data == data
        assert fec_res.fec_corrected > 0
        assert not plain_ok, "test SNR too benign: plain decode also passed"

    def test_chunked_fec_streaming(self):
        mode = MODES["QPSK"]
        data = np.random.default_rng(7).bytes(mode.chunk_size + 321)
        sig = np.concatenate(list(api.encode_chunked(data, mode, "c.bin", fec=True)))
        noisy = channel.apply_channel_np(sig, channel.ChannelSpec(snr_db=14.0), seed=13)
        res = api.decode_chunked(noisy, mode, fec=True)
        assert not isinstance(res, framing.FrameError)
        assert res.complete, res.missing_chunks
        assert res.data == data


class TestInterleaving:
    def test_interleave_roundtrip(self):
        rng = np.random.default_rng(17)
        coded = rs.rs_encode(rng.bytes(700))  # 4 ragged codewords
        lens = rs.codeword_lengths(len(coded))
        inter = rs.interleave(coded, len(lens))
        assert len(inter) == len(coded)
        assert rs.deinterleave(inter, len(lens), lens) == coded

    def test_burst_beyond_single_codeword_capacity(self):
        """A 40-byte contiguous burst (>16, the per-codeword limit) is
        corrected thanks to interleaving across 3 codewords."""
        data = np.random.default_rng(19).bytes(600)  # 3 codewords
        payload = framing.build_legacy_payload(data, "b.bin")
        wrapped = bytearray(framing.wrap_fec(payload))
        start = 100
        for p in range(start, start + 40):
            wrapped[p] ^= 0x5A
        res = framing.parse_payload_bytes(bytes(wrapped))
        assert isinstance(res, framing.LegacyFrame), getattr(res, "error", res)
        assert res.crc_valid and res.data == data
        assert res.fec_corrected == 40


class TestErasures:
    """Errors-and-erasures decoding: known-unreliable positions double the
    correction radius (2e + f <= 32 per codeword vs e <= 16)."""

    def test_erasures_only_full_capacity(self):
        rng = np.random.default_rng(23)
        data = rng.bytes(223)
        coded = bytearray(rs.rs_encode(data))
        pos = rng.choice(255, 32, replace=False)
        for p in pos:
            coded[p] ^= int(rng.integers(1, 256))
        flags = np.zeros(255, bool)
        flags[pos] = True
        dec, c = rs.rs_decode(bytes(coded), erasures=flags)
        assert dec == data and c == 32

    def test_mixed_errors_and_erasures(self):
        rng = np.random.default_rng(29)
        data = rng.bytes(223)
        for f, e in [(30, 1), (20, 6), (10, 11), (0, 16)]:
            coded = bytearray(rs.rs_encode(data))
            pos = rng.choice(255, f + e, replace=False)
            for p in pos:
                coded[p] ^= int(rng.integers(1, 256))
            flags = np.zeros(255, bool)
            flags[pos[:f]] = True  # only the erasures are known
            dec, c = rs.rs_decode(bytes(coded), erasures=flags)
            assert dec == data and c == f + e

    def test_beyond_capacity_raises(self):
        rng = np.random.default_rng(31)
        data = rng.bytes(223)
        coded = bytearray(rs.rs_encode(data))
        pos = rng.choice(255, 40, replace=False)
        for p in pos:
            coded[p] ^= int(rng.integers(1, 256))
        flags = np.zeros(255, bool)
        flags[pos[:20]] = True  # 20 erasures + 20 errors: 2e+f = 60 > 32
        with pytest.raises(ValueError):
            rs.rs_decode(bytes(coded), erasures=flags)

    def test_false_erasure_hints_harmless_on_clean_codeword(self):
        data = np.random.default_rng(37).bytes(223)
        coded = rs.rs_encode(data)
        flags = np.zeros(255, bool)
        flags[:10] = True
        dec, c = rs.rs_decode(coded, erasures=flags)
        assert dec == data and c == 0

    def test_burst_dropout_rescued_by_evm_erasures(self):
        """A 3-symbol dropout on BPSK-ACOUSTIC corrupts 24 consecutive
        payload bytes — beyond the 16-error radius of the single codeword,
        so errors-only FEC fails; the decoder's EVM-driven erasure retry
        (decoder._byte_erasures) recovers the frame. The reference cannot
        decode this signal at all (CRC-only)."""
        from audio_modem_tpu import decoder

        mode = MODES["BPSK-ACOUSTIC"]
        rng = np.random.default_rng(41)
        payload = rng.bytes(150)
        sig = np.asarray(framing.build_transmit_signal(payload, mode, "e.bin", fec=True))
        res, info = decoder.decode_signal(sig, mode)
        assert not isinstance(res, framing.FrameError)

        sym = mode.profile.symbol_len
        s0 = info.preamble_idx + 3 * sym + 5 * sym
        bad = sig.copy()
        bad[s0 : s0 + 3 * sym] = 0.0
        res2, _ = decoder.decode_signal(bad, mode)
        assert not isinstance(res2, framing.FrameError), res2
        assert res2.data == payload
        assert res2.fec_corrected == 24

        # noise burst (not just silence) is caught the same way
        bad = sig.copy()
        bad[s0 : s0 + 3 * sym] = rng.normal(0, 0.3, 3 * sym).astype(np.float32)
        res3, _ = decoder.decode_signal(bad, mode)
        assert not isinstance(res3, framing.FrameError), res3
        assert res3.data == payload

        # 5 dropped symbols = 40 bytes > 32: cleanly uncorrectable
        bad = sig.copy()
        bad[s0 : s0 + 5 * sym] = 0.0
        res4, _ = decoder.decode_signal(bad, mode)
        assert isinstance(res4, framing.FrameError)

    def test_streaming_chunk_dropout_rescued(self):
        """Same rescue through the streaming receiver's chunk-frame path."""
        from audio_modem_tpu.runtime.receiver import StreamingReceiver

        mode = MODES["BPSK-ACOUSTIC"]
        rng = np.random.default_rng(43)
        data = rng.bytes(mode.chunk_size + 100)
        frames = list(api.encode_chunked(data, mode, "s.bin", fec=True))
        sig = np.concatenate(frames)
        # drop 3 symbols inside the SECOND data frame's payload region
        sym = mode.profile.symbol_len
        p = mode.profile
        off = len(frames[0]) + len(frames[1]) + p.silence_pre_chunk(False) + 8 * sym
        sig = sig.copy()
        sig[off : off + 3 * sym] = 0.0
        rx = StreamingReceiver(mode, fec=True)
        for i in range(0, len(sig), 4096):
            rx.process_audio_block(sig[i : i + 4096])
        rx.flush()
        assert rx.assembler.is_complete
        assert rx.assembler.assemble() == data
        rx.cleanup()
