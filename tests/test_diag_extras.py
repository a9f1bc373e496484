"""Tests for the xcorr fallback detector, BER sweep, rate info, bitmap."""

import jax.numpy as jnp
import numpy as np

from audio_modem_tpu import diag, framing, sync
from audio_modem_tpu.configs import MODES


class TestXcorrFallback:
    def test_finds_preamble_dense(self):
        mode = MODES["QPSK"]
        sig = framing.build_transmit_signal(b"x" * 100, mode, "f")
        n = len(sig)
        pad = np.zeros(-(-n // 64) * 64, np.float32)
        pad[:n] = sig
        sp = sync.preprocess(jnp.asarray(pad), jnp.int32(n))
        idx, best = sync.detect_preamble_xcorr(sp, mode.profile, jnp.int32(n))
        true_start = mode.profile.silence_pre_legacy()
        assert abs(int(idx) - true_start) <= 2
        assert float(best) > 0.9

    def test_noise_metric_is_weak(self):
        # With a 576-sample template, noise max-xcorr over thousands of
        # positions sits near the reference's (weak) 0.15 threshold; assert
        # it stays far below real-signal levels (>0.9).
        rng = np.random.default_rng(0)
        noise = rng.standard_normal(8192).astype(np.float32) * 0.1
        idx, best = sync.detect_preamble_xcorr(
            jnp.asarray(noise), MODES["QPSK"].profile, jnp.int32(8192)
        )
        assert float(best) < 0.3


class TestBerSweep:
    def test_monotone_ish(self):
        curve = diag.ber_vs_snr(MODES["QPSK"], snrs_db=(-5.0, 10.0, 30.0), n_streams=4, n_sym=4)
        assert curve[30.0] == 0.0
        assert curve[-5.0] > 0.05
        assert curve[-5.0] >= curve[10.0] >= curve[30.0]


class TestRateInfo:
    def test_against_published_orders(self):
        # README_en.md:49-53 orders of magnitude (BASELINE.md table)
        qpsk = diag.rate_info(MODES["QPSK"])
        assert 2000 < qpsk.effective_bytes_per_sec < 4100  # ~2.5 KB/s published
        qam = diag.rate_info(MODES["16-QAM"])
        assert 4500 < qam.effective_bytes_per_sec < 8200  # ~5 KB/s published
        ac = diag.rate_info(MODES["BPSK-ACOUSTIC"])
        assert 300 < ac.effective_bytes_per_sec < 600  # ~0.5 KB/s published
        rep = diag.rate_info(MODES["BPSK-REPEAT"])
        assert 100 < rep.effective_bytes_per_sec < 250  # ~170 B/s published

    def test_max_bytes_scales_with_duration(self):
        a = diag.rate_info(MODES["QPSK"], 60.0)
        b = diag.rate_info(MODES["QPSK"], 120.0)
        assert b.max_bytes > a.max_bytes * 1.9


class TestBitmap:
    def test_render(self):
        bm = np.zeros(100, bool)
        bm[:50] = True
        s = diag.render_chunk_bitmap(bm, width=10)
        assert s == "#####....."
        assert diag.render_chunk_bitmap(np.ones(5, bool), width=10) == "#####"
        bm2 = np.zeros(4, bool); bm2[0] = True
        assert diag.render_chunk_bitmap(bm2, width=2) == "+."  # half-full cell


class TestQam64Extension:
    """64-QAM: spec'd by the reference (docs/protocol_spec.md:27) but never
    implemented there; a real mode here."""

    def test_constellation(self):
        from audio_modem_tpu.ops.constellations import CONSTELLATIONS

        c = CONSTELLATIONS["QAM64"]
        pts = c.points_np()
        assert c.bps == 6 and len(pts) == 64
        assert abs((pts**2).sum(axis=1).mean() - 1.0) < 1e-12

    def test_roundtrip_and_rate(self):
        from audio_modem_tpu import api, framing

        mode_rate = diag.rate_info(MODES["64-QAM"])
        assert 6500 < mode_rate.effective_bytes_per_sec < 12000  # ~7.7 KB/s spec'd
        data = np.random.default_rng(73).bytes(4000)
        sig = api.encode_legacy(data, "64-QAM", "q64.bin")
        result, _ = api.decode(sig, "64-QAM")
        assert isinstance(result, framing.LegacyFrame)
        assert result.crc_valid and result.data == data

    def test_under_mild_awgn(self):
        from audio_modem_tpu import api, channel, framing

        data = np.random.default_rng(79).bytes(1000)
        sig = api.encode_legacy(data, "64-QAM", "n.bin")
        rx = channel.apply_channel_np(sig, channel.ChannelSpec(snr_db=35.0), seed=7)
        result, _ = api.decode(rx, "64-QAM")
        assert isinstance(result, framing.LegacyFrame) and result.crc_valid


class TestPlots:
    def test_plot_outputs(self, tmp_path):
        from audio_modem_tpu.utils import plots
        from audio_modem_tpu.configs import OFDM_PROFILES

        p = OFDM_PROFILES["standard"]
        rng = np.random.default_rng(0)
        spec_db = rng.uniform(-80, -20, 1024)
        freqs = np.linspace(0, 22050, 1024)
        f1 = plots.plot_spectrum(spec_db, freqs, str(tmp_path / "s.png"), p)
        f2 = plots.plot_channel_response(rng.uniform(0, 1, p.num_active_subs), p, str(tmp_path / "c.png"))
        f3 = plots.plot_waveform(rng.standard_normal(20000).astype(np.float32), str(tmp_path / "w.png"))
        f4 = plots.plot_ber_curve({0.0: 0.1, 10.0: 0.01, 20.0: 0.0}, str(tmp_path / "b.png"))
        import os
        for f in (f1, f2, f3, f4):
            assert os.path.getsize(f) > 1000


class TestEvm:
    def test_evm_clean_vs_noisy(self):
        from audio_modem_tpu import channel as ch

        mode = MODES["QPSK"]
        sig, _ = diag.generate_test_signal(mode)
        clean = diag.analyze_loopback(sig, mode)
        assert clean.evm is not None and clean.evm < 0.02
        noisy_sig = ch.apply_channel_np(sig, ch.ChannelSpec(snr_db=12.0), seed=21)
        noisy = diag.analyze_loopback(noisy_sig, mode)
        assert noisy.evm > clean.evm * 3


class TestSlidingCorrelate:
    def test_matches_direct_correlation(self):
        from audio_modem_tpu.configs import OFDM_PROFILES

        rng = np.random.default_rng(31)
        for pname in ("standard", "acoustic", "narrowband"):
            p = OFDM_PROFILES[pname]
            plen = p.symbol_len
            L = plen + 500
            x = rng.standard_normal(L).astype(np.float32)
            got = np.asarray(sync.sliding_correlate(jnp.asarray(x), p))
            pre1 = p.preamble1.astype(np.float64)
            ref = np.array([x[d : d + plen].astype(np.float64) @ pre1 for d in range(L - plen + 1)])
            assert got.shape == ref.shape
            assert np.abs(got - ref).max() < 1e-3 * max(1.0, np.abs(ref).max())

    def test_batched(self):
        from audio_modem_tpu.configs import OFDM_PROFILES

        p = OFDM_PROFILES["standard"]
        rng = np.random.default_rng(33)
        x = rng.standard_normal((3, p.symbol_len + 300)).astype(np.float32)
        got = np.asarray(sync.sliding_correlate(jnp.asarray(x), p))
        for i in range(3):
            one = np.asarray(sync.sliding_correlate(jnp.asarray(x[i]), p))
            assert np.allclose(got[i], one, atol=1e-5)
