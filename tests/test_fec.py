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
