"""Committed golden-WAV regression: decode fixed reference-format WAVs
(generated once by the float64 oracle, committed to the repo) and verify the
payload byte-exactly via sha256. Independent of the live oracle code — a
co-evolution guard: if the framework and oracle ever drift together, these
frozen fixtures still catch it. 16-bit PCM quantization is part of the test
(real captures are never float-exact)."""

import hashlib
import json
from pathlib import Path

import pytest

from audio_modem_tpu import api, framing
from audio_modem_tpu.utils.wav import read_wav

GOLDEN = Path(__file__).parent / "golden"
MANIFEST = json.loads((GOLDEN / "manifest.json").read_text())


@pytest.mark.parametrize("mode_name", sorted(MANIFEST))
def test_golden_wav_decodes_bit_exact(mode_name):
    entry = MANIFEST[mode_name]
    signal, rate = read_wav(str(GOLDEN / entry["wav"]))
    assert rate == 44100
    assert len(signal) == entry["samples"]
    result, info = api.decode(signal, mode_name)
    assert isinstance(result, framing.LegacyFrame), getattr(result, "error", result)
    assert result.crc_valid
    assert result.file_name == entry["file_name"]
    assert hashlib.sha256(result.data).hexdigest() == entry["sha256"]
    assert result.data.hex() == entry["payload_hex"]
