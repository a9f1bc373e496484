"""Direct analogs of the BASELINE.json workload configs (scaled to CI).

config 1 (narrowband loopback)          -> tests/test_roundtrip.py
config 2 (BPSK-repeat 32KB file, AWGN)  -> here
config 3 (QPSK 1MB chunked)             -> here (batched decode of all frames)
config 4 (16-QAM multipath)             -> tests/test_streaming.py
config 5 (multi-stream scale)           -> tests/test_multi_receiver.py + bench
"""

import numpy as np
import pytest

from audio_modem_tpu import api, channel, framing
from audio_modem_tpu.configs import MODES
from audio_modem_tpu.ops.bits import bits_to_bytes
from audio_modem_tpu.parallel.batch import batch_decode_signals, pad_signals


class TestConfig2BpskRepeat32K:
    def test_32kb_legacy_awgn(self):
        """BASELINE config 2: 32KB file, BPSK-repeat x3, AWGN channel.
        32 KB routes to ONE legacy frame (the threshold boundary) of ~12K
        OFDM symbols (~3 minutes of audio)."""
        mode = MODES["BPSK-REPEAT"]
        data = np.random.default_rng(5).bytes(32 * 1024 - 32)
        frames = api.encode(data, mode, "big.bin")
        assert len(frames) == 1  # legacy route at the threshold
        sig = frames[0]
        assert len(sig) > 7_000_000  # ~3 minutes of audio
        noisy = channel.apply_channel_np(sig, channel.ChannelSpec(snr_db=12.0), seed=6)
        result, _ = api.decode(noisy, mode)
        assert isinstance(result, framing.LegacyFrame), getattr(result, "error", result)
        assert result.crc_valid and result.data == data


class TestConfig3QpskMegabyte:
    def test_1mb_chunked_batched_decode(self):
        """BASELINE config 3: 1MB file chunked (2KB QPSK frames). All 512
        data frames decode in ONE batched device program — the scale path —
        and reassemble to the exact file."""
        import jax.numpy as jnp

        mode = MODES["QPSK"]
        p = mode.profile
        sym = p.symbol_len
        data = np.random.default_rng(7).bytes(1024 * 1024)
        frames = list(api.encode_chunked(data, mode, "mb.bin"))
        assert len(frames) == 1 + 512
        signals, n_valid = pad_signals(frames[1:])  # the 512 data frames
        max_syms = (signals.shape[1] - 3 * sym) // sym
        out = batch_decode_signals(jnp.asarray(signals), jnp.asarray(n_valid), mode, max_syms)
        assert bool(np.asarray(out["detected"]).all())
        starts = np.asarray(out["start"])
        bits = np.asarray(out["bits"])
        assembled = bytearray(len(data))
        for i in range(512):
            n_sym = (int(n_valid[i]) - (int(starts[i]) + 3 * sym)) // sym
            b = bits[i][: min(n_sym, max_syms) * mode.bits_per_symbol]
            parsed = framing.parse_payload_bytes(bits_to_bytes(b), min_len=6)
            assert isinstance(parsed, framing.DataFrame), (i, parsed)
            assert parsed.crc_valid
            off = parsed.seq_num * mode.chunk_size
            assembled[off : off + len(parsed.data)] = parsed.data
        assert bytes(assembled) == data
