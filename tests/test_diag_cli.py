"""Diagnostics + CLI end-to-end tests."""

import numpy as np
import pytest

from audio_modem_tpu import channel, diag
from audio_modem_tpu.configs import MODES
from audio_modem_tpu.utils.wav import read_wav, write_wav


class TestDiag:
    def test_sweep_tone(self):
        s = diag.generate_sweep_tone(duration=0.5)
        assert len(s) == 22050
        assert np.abs(s).max() <= 0.8 + 1e-6
        assert abs(s[0]) < 1e-6  # fade-in starts at zero

    def test_loopback_clean(self):
        mode = MODES["QPSK"]
        sig, payload = diag.generate_test_signal(mode)
        report = diag.analyze_loopback(sig, mode)
        assert report.detected
        assert report.ber == 0.0
        assert report.correlation > 0.8
        assert report.quality == "excellent"
        assert report.recommended_mode == "16-QAM"
        assert len(report.channel_magnitude) == mode.profile.num_active_subs

    def test_loopback_noisy(self):
        mode = MODES["BPSK-ACOUSTIC"]
        sig, _ = diag.generate_test_signal(mode)
        rx = channel.apply_channel_np(sig, channel.ChannelSpec(snr_db=12.0, gain=0.4), seed=5)
        report = diag.analyze_loopback(rx, mode)
        assert report.detected
        assert report.ber < 0.05

    def test_loopback_garbage(self):
        # The xcorr fallback's 0.15 threshold (modem.js:263) is weak enough
        # that noise may nominally "detect" (reference behaves identically);
        # the verdict must still be poor with BER ~ 0.5.
        noise = np.random.default_rng(9).standard_normal(30000).astype(np.float32) * 0.05
        report = diag.analyze_loopback(noise, MODES["QPSK"])
        assert report.quality == "poor"
        assert report.ber > 0.3
        assert report.recommended_mode == "BPSK-REPEAT"

    def test_input_analysis(self):
        tone = 0.3 * np.sin(2 * np.pi * 1000 * np.arange(44100) / 44100)
        rep = diag.analyze_input(tone.astype(np.float32))
        assert abs(rep.rms - 0.3 / np.sqrt(2)) < 0.01
        assert abs(rep.peak - 0.3) < 0.01
        assert not rep.clipping
        peak_freq = rep.freqs[rep.spectrum_db.argmax()]
        assert abs(peak_freq - 1000) < 50


class TestWav:
    def test_roundtrip(self, tmp_path):
        sig = np.random.default_rng(2).uniform(-0.9, 0.9, 5000).astype(np.float32)
        path = str(tmp_path / "t.wav")
        write_wav(path, sig)
        back, rate = read_wav(path)
        assert rate == 44100
        assert np.abs(back - sig).max() < 1e-3  # 16-bit quantization


class TestCli:
    def test_encode_decode_file(self, tmp_path):
        from audio_modem_tpu.cli import main

        data = np.random.default_rng(3).bytes(900)
        src = tmp_path / "input.bin"
        src.write_bytes(data)
        wav = tmp_path / "signal.wav"
        assert main(["encode", str(src), str(wav), "--mode", "QPSK"]) == 0
        out = tmp_path / "out.bin"
        assert main(["decode", str(wav), "-o", str(out), "--mode", "QPSK"]) == 0
        assert out.read_bytes() == data

    def test_receive_chunked(self, tmp_path):
        from audio_modem_tpu import api
        from audio_modem_tpu.cli import main

        mode = MODES["QPSK"]
        data = np.random.default_rng(4).bytes(mode.chunk_size + 77)
        sig = np.concatenate(list(api.encode_chunked(data, mode, "file.bin")))
        wav = tmp_path / "rx.wav"
        write_wav(str(wav), sig)
        out = tmp_path / "recv.bin"
        assert main(["receive", str(wav), "-o", str(out), "--mode", "QPSK"]) == 0
        assert out.read_bytes() == data

    def test_info_and_testsignal(self, tmp_path, capsys):
        from audio_modem_tpu.cli import main

        assert main(["info"]) == 0
        out = capsys.readouterr().out
        assert "BPSK-NARROW" in out
        ts = tmp_path / "ts.wav"
        assert main(["testsignal", str(ts), "--mode", "BPSK-ACOUSTIC"]) == 0
        sig, _ = read_wav(str(ts))
        report = diag.analyze_loopback(sig, MODES["BPSK-ACOUSTIC"])
        assert report.quality == "excellent"


class TestCliDiagnostics:
    def test_diagnose_command(self, tmp_path, capsys):
        import json as _json

        from audio_modem_tpu.cli import main

        ts = tmp_path / "t.wav"
        assert main(["testsignal", str(ts), "--mode", "QPSK"]) == 0
        capsys.readouterr()
        assert main(["diagnose", str(ts), "--mode", "QPSK"]) == 0
        report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert report["detected"] and report["quality"] == "excellent"
        assert report["recommended_mode"] == "16-QAM"

    def test_diagnose_live_clean(self, capsys):
        """Duplex pre-test: play + record simultaneously over a pipe pair
        (the reference's live loopback, app.js:1509-1618)."""
        import json as _json

        from audio_modem_tpu.cli import main

        assert main(["diagnose", "--live", "--mode", "QPSK"]) == 0
        report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert report["detected"] and report["quality"] == "excellent"
        assert report["recommended_mode"] == "16-QAM"
        assert report["samples_recorded"] > 0
        assert report["input"]["peak"] > 0.1 and not report["input"]["clipping"]

    def test_diagnose_live_injected_channel(self, capsys):
        import json as _json

        from audio_modem_tpu.cli import main

        assert main(
            ["diagnose", "--live", "--mode", "BPSK-ACOUSTIC",
             "--channel", "snr=12,gain=0.4"]
        ) == 0
        report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert report["detected"]
        assert report["ber"] < 0.05

    def test_live_diagnosis_api_degraded_channel(self):
        """Library-level: a poor channel must downgrade the recommendation."""
        from audio_modem_tpu.diag import live_loopback_diagnosis

        mode = MODES["QPSK"]
        noisy = lambda s: channel.apply_channel_np(  # noqa: E731
            s, channel.ChannelSpec(snr_db=-8.0, gain=0.2), seed=3
        )
        d = live_loopback_diagnosis(mode, channel_fn=noisy)
        assert d.samples_recorded == d.samples_played
        assert d.loopback.quality == "poor"
        assert d.loopback.recommended_mode == "BPSK-REPEAT"

    def test_sweep_command(self, tmp_path):
        from audio_modem_tpu.cli import main
        from audio_modem_tpu.utils.wav import read_wav

        out = tmp_path / "sweep.wav"
        assert main(["sweep", str(out)]) == 0
        sig, rate = read_wav(str(out))
        assert rate == 44100 and len(sig) == 2 * 44100
