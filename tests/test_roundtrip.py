"""Golden cross-validation: the JAX framework and the float64 JS-oracle must
agree in both directions at the payload level (the bit-exactness contract),
and TX waveforms must match within float32 tolerance, for all 5 modes."""

import numpy as np
import pytest

from audio_modem_tpu import decoder, framing
from audio_modem_tpu.configs import MODES
from tests.oracle import jsmodem as oracle

# Reference modes only: the oracle models the reference implementation,
# which does not implement the 64-QAM extension mode.
ALL_MODES = ["QPSK", "16-QAM", "BPSK-ACOUSTIC", "BPSK-REPEAT", "BPSK-NARROW"]

# Per-mode payload sizes chosen to span >1 OFDM symbol but keep tests fast.
PAYLOAD_SIZES = {"QPSK": 1500, "16-QAM": 3000, "BPSK-ACOUSTIC": 300, "BPSK-REPEAT": 120, "BPSK-NARROW": 48}


def _payload(n: int, seed: int = 7) -> bytes:
    return np.random.default_rng(seed).bytes(n)


@pytest.mark.parametrize("mode_name", ALL_MODES)
class TestLegacyFrame:
    def test_tx_waveform_matches_oracle(self, mode_name):
        data = _payload(PAYLOAD_SIZES[mode_name])
        ours = framing.build_transmit_signal(data, MODES[mode_name], "t.bin")
        ref = oracle.build_transmit_signal(data, mode_name, "t.bin")
        assert ours.shape == ref.shape
        err = np.abs(ours.astype(np.float64) - ref.astype(np.float64)).max()
        assert err < 3e-5, f"max abs waveform diff {err}"

    def test_framework_decodes_oracle_signal(self, mode_name):
        data = _payload(PAYLOAD_SIZES[mode_name], seed=11)
        sig = oracle.build_transmit_signal(data, mode_name, "hello.bin")
        result, info = decoder.decode_signal(sig, MODES[mode_name])
        assert isinstance(result, framing.LegacyFrame), getattr(result, "error", result)
        assert result.crc_valid
        assert result.data == data
        assert result.file_name == "hello.bin"
        assert info.fine_metric > 0.8

    def test_oracle_decodes_framework_signal(self, mode_name):
        data = _payload(PAYLOAD_SIZES[mode_name], seed=13)
        sig = framing.build_transmit_signal(data, MODES[mode_name], "x.bin")
        res = oracle.decode_received_signal(sig, mode_name)
        assert res.get("error") is None, res
        assert res["crc_valid"]
        assert res["data"] == data

    def test_framework_self_roundtrip(self, mode_name):
        data = _payload(PAYLOAD_SIZES[mode_name], seed=17)
        sig = framing.build_transmit_signal(data, MODES[mode_name], "y.bin")
        result, _ = decoder.decode_signal(sig, MODES[mode_name])
        assert isinstance(result, framing.LegacyFrame)
        assert result.crc_valid and result.data == data


@pytest.mark.parametrize("mode_name", ["QPSK", "BPSK-NARROW"])
class TestChunkFrames:
    def test_metadata_frame_cross(self, mode_name):
        mode = MODES[mode_name]
        sig = oracle.build_metadata_frame(42, 99999, mode.chunk_size, "file.zip", mode_name)
        result, _ = decoder.decode_signal(sig, mode)
        assert isinstance(result, framing.MetaFrame), getattr(result, "error", result)
        assert result.crc_valid
        assert (result.total_chunks, result.total_file_size, result.chunk_size) == (42, 99999, mode.chunk_size)
        assert result.file_name == "file.zip"

    def test_data_frame_cross_both_ways(self, mode_name):
        mode = MODES[mode_name]
        chunk = _payload(min(mode.chunk_size, 256), seed=19)
        # oracle TX -> framework full-signal decode
        sig = oracle.build_data_chunk_frame(chunk, 7, mode_name)
        result, _ = decoder.decode_signal(sig, mode)
        assert isinstance(result, framing.DataFrame), getattr(result, "error", result)
        assert result.crc_valid and result.seq_num == 7 and result.data == chunk
        # framework TX -> oracle chunk-frame decode (streaming path shape)
        sig2 = framing.build_data_chunk_frame(chunk, 9, mode)
        pre = mode.profile.silence_pre_chunk(False)
        res = oracle.decode_chunk_frame(sig2[pre:], mode_name)
        assert res.get("error") is None and res["crc_valid"] and res["seq"] == 9

    def test_framework_chunk_frame_decode(self, mode_name):
        """decode_chunk_frame on a frame starting at preamble sample 0."""
        mode = MODES[mode_name]
        chunk = _payload(128, seed=23)
        sig = framing.build_data_chunk_frame(chunk, 3, mode)
        pre = mode.profile.silence_pre_chunk(False)
        result = decoder.decode_chunk_frame(sig[pre:], mode)
        assert isinstance(result, framing.DataFrame), getattr(result, "error", result)
        assert result.crc_valid and result.seq_num == 3 and result.data == chunk


class TestErrorPaths:
    def test_no_preamble(self):
        sig = np.random.default_rng(0).standard_normal(40000).astype(np.float32) * 0.1
        result, info = decoder.decode_signal(sig, MODES["QPSK"])
        assert isinstance(result, framing.FrameError)
        assert "Preamble not detected" in result.error

    def test_corrupted_payload_fails_crc(self):
        data = _payload(500, seed=29)
        sig = oracle.build_transmit_signal(data, "QPSK", "c.bin").copy()
        # Smash a region inside the data symbols hard enough to flip bits
        p = MODES["QPSK"].profile
        start = p.silence_pre_legacy() + 4 * p.symbol_len
        sig[start : start + 3 * p.symbol_len] = 0.0
        result, _ = decoder.decode_signal(sig, MODES["QPSK"])
        if isinstance(result, framing.LegacyFrame):
            assert not result.crc_valid
