"""Pallas kernel correctness vs the XLA reference formulation (interpret
mode on CPU; the real lowering is exercised on TPU by bench.py)."""

import jax.numpy as jnp
import pytest
import numpy as np

from audio_modem_tpu import framing, sync
from audio_modem_tpu.configs import MODES


class TestFusedReceive:
    """Full-fusion decode kernel (kernels/receive.py) vs the XLA pipeline:
    decision-identical starts, detection flags, and payload bits for every
    mode, under noise. Interpret mode here; bench.py + the axon smoke test
    exercise the compiled Mosaic lowering on hardware."""

    def _signals(self, mode, n=3, payload=None, noise=0.02, seed=7):
        from audio_modem_tpu.parallel.batch import pad_signals

        rng = np.random.default_rng(seed)
        size = payload if payload is not None else min(mode.chunk_size, 512)
        frames = [framing.build_data_chunk_frame(rng.bytes(size), s, mode) for s in range(n)]
        frames = [f + noise * rng.standard_normal(len(f)).astype(np.float32) for f in frames]
        sym = mode.profile.symbol_len
        signals, n_valid = pad_signals(frames, pad_len=len(frames[0]) + 2 * sym)
        max_syms = max((signals.shape[1] - 3 * sym) // sym, 1)
        return jnp.asarray(signals), jnp.asarray(n_valid), max_syms

    @pytest.mark.cpu_numerics
    def test_decode_fused_matches_xla_all_modes(self):
        from audio_modem_tpu.kernels.receive import decode_fused
        from audio_modem_tpu.parallel.batch import _batch_decode_signals_xla

        for name in ["QPSK", "16-QAM", "BPSK-ACOUSTIC", "BPSK-NARROW", "64-QAM"]:
            mode = MODES[name]
            signals, n_valid, max_syms = self._signals(mode)
            ref = _batch_decode_signals_xla(signals, n_valid, jnp.zeros(signals.shape[0], jnp.int32), mode, max_syms)
            out = decode_fused(
                signals, n_valid, jnp.zeros(signals.shape[0], jnp.int32),
                mode, max_syms, interpret=True,
            )
            assert np.asarray(out["detected"]).all(), name
            for key in ("start", "detected", "bits"):
                assert np.array_equal(np.asarray(ref[key]), np.asarray(out[key])), (name, key)
            assert np.abs(np.asarray(ref["fine_metric"]) - np.asarray(out["fine_metric"])).max() < 1e-5

    @pytest.mark.cpu_numerics
    def test_decode_fused_channel_estimate(self):
        """ch_re/ch_im reassembled from the kernel's sectioned CE output
        match the XLA estimate on active bins."""
        from audio_modem_tpu import phy
        from audio_modem_tpu.kernels.receive import decode_fused

        import jax

        mode = MODES["QPSK"]
        p = mode.profile
        signals, n_valid, max_syms = self._signals(mode, n=2)
        out = decode_fused(
            signals, n_valid, jnp.zeros(2, jnp.int32), mode, max_syms, interpret=True
        )
        sp = sync.preprocess(signals, n_valid)
        sym = p.symbol_len
        for i in range(2):
            start = int(out["start"][i])
            ce = jax.lax.dynamic_slice(sp[i], (start + 2 * sym,), (sym,))
            r_re, r_im = phy.estimate_channel(ce, p)
            assert np.abs(np.asarray(r_re) - np.asarray(out["ch_re"][i])).max() < 1e-4
            assert np.abs(np.asarray(r_im) - np.asarray(out["ch_im"][i])).max() < 1e-4

    def test_decode_fused_no_preamble(self):
        """Pure noise: detected must be False, matching XLA."""
        from audio_modem_tpu.kernels.receive import decode_fused

        mode = MODES["QPSK"]
        rng = np.random.default_rng(3)
        signals = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32) * 0.05)
        n_valid = jnp.asarray([8192, 4000], dtype=jnp.int32)
        out = decode_fused(signals, n_valid, jnp.zeros(2, jnp.int32), mode, 4, interpret=True)
        assert not np.asarray(out["detected"]).any()

    @pytest.mark.cpu_numerics
    def test_decode_chunks_fused_matches_xla_all_modes(self):
        from audio_modem_tpu.kernels.receive import decode_chunks_fused
        from audio_modem_tpu.parallel.batch import _batch_decode_chunk_frames_xla

        rng = np.random.default_rng(11)
        for name in ["QPSK", "16-QAM", "BPSK-ACOUSTIC", "BPSK-NARROW", "64-QAM"]:
            mode = MODES[name]
            p = mode.profile
            sym = p.symbol_len
            size = 256 if "BPSK" in name else mode.chunk_size
            n_sym = framing.num_symbols_for_payload(size + 11, mode)
            fr = []
            for s in range(5):
                f = framing.build_data_chunk_frame(rng.bytes(size), s, mode)
                f = f[p.silence_pre_chunk(False):][: (3 + n_sym) * sym]
                fr.append(f + 0.02 * rng.standard_normal(len(f)).astype(np.float32))
            frames = jnp.asarray(np.stack(fr))
            ref = np.asarray(_batch_decode_chunk_frames_xla(frames, mode, n_sym))
            out = np.asarray(decode_chunks_fused(frames, mode, n_sym, interpret=True))
            assert np.array_equal(ref, out), name

    @pytest.mark.cpu_numerics
    def test_stream_pair_kernel_matches_xla_and_extract(self):
        """Standard profile (sym=576, lane-misaligned): the PAIR-SLOT
        streaming kernel (2-symbol 1152-lane super-slots against the
        block-diagonal _rx_sections_pair DFT, no HBM body-extraction
        prologue) must be bit-identical to both the XLA reference and the
        force_extract path it replaces. Odd n_sym exercises the half-empty
        trailing pair."""
        from audio_modem_tpu.kernels.receive import decode_chunks_fused_stream
        from audio_modem_tpu.parallel.batch import _batch_decode_chunk_frames_xla

        rng = np.random.default_rng(13)
        mode = MODES["QPSK"]
        p = mode.profile
        sym = p.symbol_len
        assert sym % 128 and (2 * sym) % 128 == 0  # the pair-path precondition
        for size in (mode.chunk_size, 3 * mode.chunk_size // 2):
            n_sym = framing.num_symbols_for_payload(size + 11, mode)
            fr = []
            for s in range(5):
                f = framing.build_data_chunk_frame(rng.bytes(size), s, mode)
                f = f[p.silence_pre_chunk(False):][: (3 + n_sym) * sym]
                fr.append(f + 0.02 * rng.standard_normal(len(f)).astype(np.float32))
            frames = jnp.asarray(np.stack(fr))
            ref = np.asarray(_batch_decode_chunk_frames_xla(frames, mode, n_sym))
            pair = np.asarray(
                decode_chunks_fused_stream(frames, mode, n_sym, interpret=True)
            )
            ext = np.asarray(
                decode_chunks_fused_stream(
                    frames, mode, n_sym, interpret=True, force_extract=True
                )
            )
            assert np.array_equal(ref, pair), (size, "pair vs xla")
            assert np.array_equal(ref, ext), (size, "extract vs xla")

    def test_vmem_gate_routes_long_frames(self, monkeypatch):
        """fused_receive_fits rejects frames whose VMEM footprint would blow
        the Mosaic compile (observed: ~500k-sample narrowband frames); past
        the gate the dispatchers route to the STREAMING kernel on TPU and to
        the XLA path elsewhere — so the resident kernel can never see a
        legacy 32 KB frame (~7.3M samples), and on CPU (this test, kernels
        forced on) the XLA fallback must hold."""
        from audio_modem_tpu.kernels.receive import fused_chunks_fits, fused_receive_fits
        from audio_modem_tpu.parallel import batch

        qpsk = MODES["QPSK"]
        narrow = MODES["BPSK-NARROW"]
        # bench/streaming shapes fit
        assert fused_receive_fits(28544, qpsk, 46)
        assert fused_receive_fits(180_000, MODES["BPSK-ACOUSTIC"], 208)
        # 512 B narrowband (~500k samples / ~590 syms) and the legacy 32 KB
        # frame (~7.3M samples) must not
        assert not fused_receive_fits(500_000, narrow, 590)
        assert not fused_receive_fits(7_300_000, narrow, 9300)
        assert fused_chunks_fits(30_000, qpsk, 46)
        assert not fused_chunks_fits(7_300_000, narrow, 9300)

        # dispatch falls back to XLA (this would crash on CPU if the
        # non-interpret pallas path were taken with kernels forced on)
        monkeypatch.setenv("AMT_KERNELS", "1")
        signals, n_valid, max_syms = self._signals(narrow, n=2, payload=64)
        long = jnp.pad(signals, ((0, 0), (0, 600_000 - signals.shape[1])))
        out = batch.batch_decode_signals(long, n_valid, narrow, max_syms)
        assert np.asarray(out["detected"]).all()

    def test_stream_kernel_routing_per_profile(self, monkeypatch):
        """Past-VMEM long chunk frames route by measured winner per profile
        (BENCH r4 A/B): lane-aligned symbols take the streaming kernel on
        TPU, the lane-misaligned standard profile (sym=576) takes XLA, and
        every profile takes XLA off-TPU."""
        import jax

        from audio_modem_tpu.parallel.batch import stream_kernel_preferred

        assert not stream_kernel_preferred(MODES["QPSK"])  # CPU backend here
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert stream_kernel_preferred(MODES["BPSK-ACOUSTIC"])  # sym 640
        assert stream_kernel_preferred(MODES["BPSK-NARROW"])    # sym 768
        for name in ("QPSK", "16-QAM", "64-QAM"):               # sym 576
            assert not stream_kernel_preferred(MODES[name])

    def test_bit_packing_roundtrip(self):
        """The 16-bit pack matrices invert exactly through the unpack
        epilogue for every constellation geometry."""
        from audio_modem_tpu.kernels.receive import _geometry, _pack_matrix

        for name in ["QPSK", "16-QAM", "BPSK-ACOUSTIC", "BPSK-NARROW", "64-QAM"]:
            mode = MODES[name]
            g = _geometry(mode.profile)
            nd, nd_pad, bps = g["nd"], g["nd_pad"], mode.bps
            pm = _pack_matrix(mode)
            rng = np.random.default_rng(5)
            bits = rng.integers(0, 2, (4, nd, bps))
            words = np.zeros((4, 128), np.float32)
            for b in range(bps):
                plane = np.zeros((4, nd_pad), np.float32)
                plane[:, :nd] = bits[:, :, b]
                words += plane @ pm[b * nd_pad : (b + 1) * nd_pad]
            n_words = -(-(nd * bps) // 16)
            w = words[:, :n_words].astype(np.int64)
            shifts = np.arange(15, -1, -1)
            unpacked = ((w[..., None] >> shifts) & 1).reshape(4, n_words * 16)[:, : nd * bps]
            assert np.array_equal(unpacked, bits.reshape(4, nd * bps))


class TestStreamingKernels:
    """Length-unbounded streaming kernels (VERDICT r2 item 3): the gridded
    demod kernel + the XLA-front-end long-frame pipeline must be
    decision-identical to the XLA path, including on frames far past the
    resident kernel's VMEM gate."""

    @pytest.mark.cpu_numerics
    def test_chunks_stream_matches_xla_all_modes(self):
        from audio_modem_tpu.kernels.receive import decode_chunks_fused_stream
        from audio_modem_tpu.parallel.batch import _batch_decode_chunk_frames_xla

        rng = np.random.default_rng(13)
        for name in ["QPSK", "16-QAM", "BPSK-ACOUSTIC", "BPSK-NARROW", "64-QAM"]:
            mode = MODES[name]
            p = mode.profile
            sym = p.symbol_len
            size = 128 if "BPSK" in name else mode.chunk_size
            n_sym = framing.num_symbols_for_payload(size + 11, mode)
            fr = []
            for s in range(3):
                f = framing.build_data_chunk_frame(rng.bytes(size), s, mode)
                f = f[p.silence_pre_chunk(False):][: (3 + n_sym) * sym]
                fr.append(f + 0.02 * rng.standard_normal(len(f)).astype(np.float32))
            frames = jnp.asarray(np.stack(fr))
            ref = np.asarray(_batch_decode_chunk_frames_xla(frames, mode, n_sym))
            out = np.asarray(decode_chunks_fused_stream(frames, mode, n_sym, interpret=True))
            assert np.array_equal(ref, out), name

    def test_long_narrowband_frame_over_500k(self):
        """A 512 B x3-repetition narrowband chunk frame (~500 k samples) —
        the exact shape VERDICT r2 flagged as exiled — through
        decode_long_fused, bit-identical to the XLA full pipeline."""
        from audio_modem_tpu.kernels.receive import (
            decode_long_fused,
            fused_receive_fits,
        )
        from audio_modem_tpu.parallel.batch import (
            _batch_decode_signals_xla,
            pad_signals,
        )

        mode = MODES["BPSK-NARROW"]
        p = mode.profile
        sym = p.symbol_len
        rng = np.random.default_rng(17)
        frames = [
            framing.build_data_chunk_frame(rng.bytes(512), s, mode) for s in range(2)
        ]
        signals, n_valid = pad_signals(frames, pad_len=len(frames[0]) + 2 * sym)
        assert signals.shape[1] > 450_000
        max_syms = max((signals.shape[1] - 3 * sym) // sym, 1)
        assert not fused_receive_fits(signals.shape[1], mode, max_syms)
        sig = jnp.asarray(signals)
        nv = jnp.asarray(n_valid)
        ref = _batch_decode_signals_xla(sig, nv, jnp.zeros(sig.shape[0], jnp.int32), mode, max_syms)
        out = decode_long_fused(
            sig, nv, jnp.zeros(2, jnp.int32), mode, max_syms, interpret=True
        )
        for key in ("start", "detected"):
            assert np.array_equal(np.asarray(ref[key]), np.asarray(out[key])), key
        assert np.asarray(out["detected"]).all()
        # bits: exact over the PAYLOAD symbols; junk/silence tail symbols
        # demodulate exact-zero bins whose signs depend on accumulation
        # order (the documented junk-tail tolerance — every consumer
        # truncates them, like the reference's modem.js:368 junk demod)
        n_payload = framing.num_symbols_for_payload(512 + 11, mode)
        nb = n_payload * mode.bits_per_symbol
        assert np.array_equal(
            np.asarray(ref["bits"])[:, :nb], np.asarray(out["bits"])[:, :nb]
        )

    def test_long_fused_no_preamble(self):
        from audio_modem_tpu.kernels.receive import decode_long_fused

        mode = MODES["QPSK"]
        rng = np.random.default_rng(29)
        signals = jnp.asarray(rng.standard_normal((2, 16384)).astype(np.float32) * 0.05)
        nv = jnp.asarray([16384, 9000], jnp.int32)
        out = decode_long_fused(signals, nv, jnp.zeros(2, jnp.int32), mode, 8, interpret=True)
        assert not np.asarray(out["detected"]).any()
