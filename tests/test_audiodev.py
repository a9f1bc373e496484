"""Audio-device backend (runtime/audiodev.py): resolution, interface
adapters, and a mocked over-the-air e2e — the reference's getUserMedia/
AudioContext path (app.js:305-316, 349-417) with the hardware mocked out
(this image, like CI, has no sound devices)."""

import subprocess
import sys
import types

import numpy as np
import pytest

from audio_modem_tpu.runtime import audiodev


class _FakeRawStream:
    """Stands in for sounddevice.RawInputStream/RawOutputStream: playback
    writes land in a shared byte buffer, capture reads drain it — a loopback
    'room' between the fake speaker and fake microphone."""

    room = bytearray()

    def __init__(self, samplerate, blocksize, device, channels, dtype, latency):
        assert samplerate == 44100 and channels == 1 and dtype == "float32"
        self.started = False
        self.closed = False

    def start(self):
        self.started = True

    def stop(self):
        pass

    def close(self):
        self.closed = True

    def write(self, buf):
        _FakeRawStream.room.extend(bytes(buf))

    def read(self, frames):
        n = min(frames * 4, len(_FakeRawStream.room))
        out = bytes(_FakeRawStream.room[:n])
        del _FakeRawStream.room[:n]
        return out, False


@pytest.fixture
def fake_sounddevice(monkeypatch):
    mod = types.ModuleType("sounddevice")
    mod.RawInputStream = _FakeRawStream
    mod.RawOutputStream = _FakeRawStream
    monkeypatch.setitem(sys.modules, "sounddevice", mod)
    _FakeRawStream.room = bytearray()
    return mod


class TestResolution:
    def test_no_backend_errors_with_guidance(self, monkeypatch):
        monkeypatch.setitem(sys.modules, "sounddevice", None)  # import -> None -> fails
        monkeypatch.setattr(audiodev.shutil, "which", lambda _: None)
        with pytest.raises(RuntimeError, match="no audio capture backend"):
            audiodev.open_capture("auto")
        with pytest.raises(RuntimeError, match="no audio playback backend"):
            audiodev.open_playback("auto")

    def test_path_backend(self, tmp_path):
        p = tmp_path / "pcm.raw"
        out = audiodev.open_playback(str(p))
        out.write(np.arange(8, dtype=np.float32).tobytes())
        out.close()
        inp = audiodev.open_capture(str(p))
        got = np.frombuffer(inp.read(32), np.float32)
        inp.close()
        assert np.array_equal(got, np.arange(8, dtype=np.float32))

    def test_alsa_backend_spawns_subprocess(self, monkeypatch):
        calls = []

        class _P:
            stdout = open("/dev/null", "rb")
            stdin = open("/dev/null", "wb")

        def fake_popen(cmd, **kw):
            calls.append(cmd)
            return _P()

        monkeypatch.setattr(subprocess, "Popen", fake_popen)
        audiodev.open_capture("alsa:hw:1,0")
        audiodev.open_playback("alsa:")
        assert calls[0][:2] == ["arecord", "-q"] and "hw:1,0" in calls[0]
        assert calls[1][:2] == ["aplay", "-q"] and "-D" not in calls[1]
        # 44.1 kHz mono float32 raw — the protocol's fixed wire format
        for c in calls:
            assert {"-f", "FLOAT_LE", "-r", "44100", "-c", "1"} <= set(c)

    def test_sd_device_spec(self):
        assert audiodev._sd_dev("") is None
        assert audiodev._sd_dev("default") is None
        assert audiodev._sd_dev("3") == 3
        assert audiodev._sd_dev("USB Mic") == "USB Mic"


class TestMockedOverTheAir:
    def test_play_to_speaker_listen_on_mic_roundtrip(self, fake_sounddevice):
        """Full e2e through the device interfaces: ingest.play() into the
        fake speaker, fake mic feeds ingest.listen() — the two-laptops-over-
        the-air scenario with the air mocked as a loopback buffer."""
        from audio_modem_tpu.runtime.ingest import listen, play

        rng = np.random.default_rng(5)
        data = rng.bytes(3000)

        spk = audiodev.open_playback("sd:default")
        n = play(data, spk, "QPSK", "air.bin", speed=0.0)
        spk.close()
        assert n > 0 and len(_FakeRawStream.room) == n * 4

        mic = audiodev.open_capture("sd:default")
        report = listen(mic, "QPSK")
        mic.close()
        res = report.result
        assert not isinstance(res, Exception)
        assert res.complete and res.data == data and res.file_name == "air.bin"

    def test_capture_stream_read_contract(self, fake_sounddevice):
        _FakeRawStream.room.extend(np.ones(4096, np.float32).tobytes())
        mic = audiodev.open_capture("auto")
        blk = mic.read(4096 * 4)
        assert len(blk) == 4096 * 4
        assert np.frombuffer(blk, np.float32).max() == 1.0
        mic.close()
