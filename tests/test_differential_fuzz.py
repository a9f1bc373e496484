"""Randomized differential testing: framework vs the float64 JS-oracle.

For random (mode, payload size, filename) combinations, signals encoded by
either stack must decode payload-bit-exactly in the other. Clean channel:
decision margins make payload equality deterministic despite f32-vs-f64
waveform differences (~3e-5)."""

import numpy as np
import pytest

from audio_modem_tpu import api, framing
from audio_modem_tpu.configs import MODES
from tests.oracle import jsmodem as oracle

RNG = np.random.default_rng(0xA0D10)

CASES = []
for mode_name, sizes in {
    "QPSK": (1, 13, 257, 1999),
    "16-QAM": (5, 300, 2500),
    "BPSK-ACOUSTIC": (1, 80, 333),
    "BPSK-REPEAT": (7, 120),
    "BPSK-NARROW": (3, 40),
}.items():
    for size in sizes:
        CASES.append((mode_name, size))


@pytest.mark.parametrize("mode_name,size", CASES)
def test_differential_roundtrip(mode_name, size):
    data = RNG.bytes(size)
    name_len = int(RNG.integers(1, 40))
    name = "".join(chr(c) for c in RNG.integers(97, 123, name_len))

    # framework TX -> oracle RX
    sig = api.encode_legacy(data, mode_name, name)
    res = oracle.decode_received_signal(sig, mode_name)
    assert res.get("error") is None, (mode_name, size, res)
    assert res["crc_valid"] and res["data"] == data and res["file_name"] == name

    # oracle TX -> framework RX
    sig2 = oracle.build_transmit_signal(data, mode_name, name)
    result, _ = api.decode(sig2, mode_name)
    assert isinstance(result, framing.LegacyFrame), (mode_name, size, getattr(result, "error", None))
    assert result.crc_valid and result.data == data and result.file_name == name
