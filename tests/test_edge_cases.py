"""Edge cases and reference-parity corners."""

import numpy as np
import pytest

from audio_modem_tpu import api, framing
from audio_modem_tpu.configs import MODES
from audio_modem_tpu.runtime.receiver import StreamingReceiver


class TestPayloadEdges:
    def test_one_byte_file(self):
        sig = api.encode_legacy(b"\x42", "QPSK", "a")
        result, _ = api.decode(sig, "QPSK")
        assert isinstance(result, framing.LegacyFrame)
        assert result.crc_valid and result.data == b"\x42"

    def test_empty_file_rejected_like_reference(self):
        # The reference's legacy parser rejects dataLen <= 0
        # (modem.js:634 'Invalid data length'); parity preserved.
        sig = api.encode_legacy(b"", "QPSK", "empty")
        result, _ = api.decode(sig, "QPSK")
        assert isinstance(result, framing.FrameError)
        assert "Invalid data length" in result.error

    def test_symbol_exact_payload(self):
        """Payload whose bit count exactly fills OFDM symbols (no padding)."""
        mode = MODES["QPSK"]
        # bits_per_symbol = 410; 410*8 bits = 410 bytes fills 8 symbols,
        # header+CRC shift it, so solve: total_payload * 8 % 410 == 0
        for total in (205, 410, 1025):
            overhead = 1 + 4 + 4 + 4  # nameLen + 'abcd' + dataLen + CRC
            data = b"z" * (total - overhead)
            payload = framing.build_legacy_payload(data, "abcd")
            assert len(payload) == total
            sig = api.encode_legacy(data, mode, "abcd")
            result, _ = api.decode(sig, mode)
            assert isinstance(result, framing.LegacyFrame) and result.crc_valid
            assert result.data == data

    def test_max_filename_and_unicode(self):
        name = "п" * 100  # 200 UTF-8 bytes
        data = b"x" * 50
        sig = api.encode_legacy(data, "QPSK", name)
        result, _ = api.decode(sig, "QPSK")
        assert isinstance(result, framing.LegacyFrame)
        assert result.crc_valid and result.file_name == name

        # Reference quirk (parity): a name truncated to 254/255 bytes makes
        # the legacy payload's first byte collide with the 0xFE/0xFF frame
        # magics, so the dispatch (modem.js:609-621) misparses it as a
        # chunk frame. 253 bytes is the longest safe name.
        safe = "n" * 253
        sig = api.encode_legacy(data, "QPSK", safe)
        result, _ = api.decode(sig, "QPSK")
        assert isinstance(result, framing.LegacyFrame)
        assert result.crc_valid and result.file_name == safe

        collided = "n" * 300  # truncated to 255 -> nameLen byte = 0xFF
        sig = api.encode_legacy(data, "QPSK", collided)
        result, _ = api.decode(sig, "QPSK")
        assert not (isinstance(result, framing.LegacyFrame) and result.crc_valid)

    def test_chunk_threshold_routing_boundary(self):
        exactly = api.encode(b"x" * (32 * 1024), "QPSK")
        assert len(exactly) == 1  # <= threshold -> legacy (app.js:131)
        over = api.encode(b"x" * (32 * 1024 + 1), "QPSK")
        assert len(over) > 1

    def test_final_chunk_single_byte(self):
        mode = MODES["QPSK"]
        data = np.random.default_rng(3).bytes(mode.chunk_size + 1)
        res = api.decode_chunked(
            np.concatenate(list(api.encode_chunked(data, mode, "t"))), mode
        )
        assert res.complete and res.data == data


class TestFalsePeakResume:
    def test_decoy_periodic_segment_before_frame(self):
        """A lag-periodic decoy ahead of the real frame must not kill the
        decode: the coarse Schmidl-Cox scan first-peak-commits on the decoy
        (its lag-fft/2 autocorrelation is ~1.0), the xcorr refinement
        rejects it (< XCORR_THRESHOLD against the true preamble waveform),
        and _decode_signal_once resumes the scan past it via min_pos —
        the one-shot analog of the streaming receiver's IDLE resume
        (app.js:879-884). Covers the min_pos > 0 dispatch path end-to-end.
        """
        from audio_modem_tpu import decoder

        mode = MODES["QPSK"]
        p = mode.profile
        rng = np.random.default_rng(11)
        data = rng.bytes(400)
        sig = api.encode_legacy(data, mode, "d.bin")

        # decoy: a pure tone at INACTIVE even bin 4 (active bins start at
        # 12) — perfectly lag-fft/2 periodic, so the Schmidl-Cox metric is
        # ~1.0, yet near-orthogonal to the wideband preamble template, so
        # the normalized xcorr stays far below XCORR_THRESHOLD. (A noise
        # decoy doesn't work: max-over-241-offsets of normalized xcorr
        # against a 576-sample template is ~2.8/sqrt(576) ~ 0.12-0.17,
        # above the reference's deliberately loose 0.1 threshold.)
        t = np.arange(2 * p.fft_size)
        decoy = (0.4 * np.sin(2 * np.pi * 4 * t / p.fft_size)).astype(np.float32)
        gap = np.zeros(2 * p.fft_size, np.float32)
        composite = np.concatenate([decoy, gap, sig]).astype(np.float32)

        # prove the decoy is a real trap: with min_pos=0 the coarse scan
        # first-peak-commits INSIDE the decoy, and refinement rejects it
        import jax.numpy as jnp

        from audio_modem_tpu import sync

        pre = sync.preprocess(jnp.asarray(composite), len(composite))
        c_idx, c_metric = sync.detect_preamble(pre, p, len(composite))
        assert 0 <= int(c_idx) <= len(decoy) - p.fft_size, int(c_idx)
        assert float(c_metric) > sync.AUTOCORR_THRESHOLD
        pad = jnp.concatenate([pre, jnp.zeros(4 * p.symbol_len, jnp.float32)])
        _, r_metric = sync.refine_xcorr(pad, c_idx, p, len(composite))
        assert float(r_metric) < sync.XCORR_THRESHOLD, float(r_metric)

        # the raw decoder must succeed purely via the min_pos resume loop
        # (decode_raw has no xcorr re-acquisition fallback behind it)
        raw, info = decoder.decode_raw(composite, mode)
        assert isinstance(raw, bytes), raw
        assert info is not None and info.preamble_idx >= len(decoy)
        assert info.fine_metric >= sync.XCORR_THRESHOLD

        # and the public path agrees
        full, _ = api.decode(composite, mode)
        assert isinstance(full, framing.LegacyFrame) and full.crc_valid
        assert full.data == data


@pytest.mark.parametrize("mode_name", ["16-QAM", "BPSK-REPEAT", "64-QAM"])
class TestAllModesChunked:
    def test_small_chunked_transfer(self, mode_name):
        mode = MODES[mode_name]
        rng = np.random.default_rng(7)
        data = rng.bytes(mode.chunk_size + 63)  # 2 chunks
        sig = np.concatenate(list(api.encode_chunked(data, mode, "m.bin")))
        rx = StreamingReceiver(mode)
        for off in range(0, len(sig), 4096):
            rx.process_audio_block(sig[off : off + 4096])
        rx.flush()
        assert rx.assembler.is_complete, rx.assembler.missing_chunks()
        assert rx.assembler.assemble() == data
