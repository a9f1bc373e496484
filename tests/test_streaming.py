"""Streaming runtime tests: ring buffer, assembler persistence/resume, the
receiver FSM over block-fed chunked transmissions, and channel robustness."""

import numpy as np
import pytest

from audio_modem_tpu import api, channel, framing
from audio_modem_tpu.configs import MODES
from audio_modem_tpu.framing import DataFrame, MetaFrame
from audio_modem_tpu.runtime.assembler import ChunkAssembler
from audio_modem_tpu.runtime.receiver import StreamingReceiver
from audio_modem_tpu.runtime.ring import RingBuffer


class TestRingBuffer:
    def test_global_addressing(self):
        rb = RingBuffer(100)
        rb.write(np.arange(60, dtype=np.float32))
        rb.write(np.arange(60, 120, dtype=np.float32))
        assert rb.total_written == 120
        assert rb.get_range(0, 10) is None  # overwritten
        got = rb.get_range(30, 50)
        assert np.array_equal(got, np.arange(30, 80, dtype=np.float32))
        assert rb.get_range(100, 30) is None  # not yet written
        assert rb.available_from(100) == 20

    def test_oversize_write(self):
        rb = RingBuffer(50)
        rb.write(np.arange(130, dtype=np.float32))
        assert rb.total_written == 130
        assert np.array_equal(rb.get_range(80, 50), np.arange(80, 130, dtype=np.float32))


class TestAssembler:
    def _meta(self, n=4, size=100, csize=32):
        return MetaFrame(n, size, csize, "f.bin", True)

    def test_in_memory(self):
        asm = ChunkAssembler()
        asm.handle_metadata(self._meta())
        asm.handle_data_chunk(DataFrame(0, b"a" * 32, True))
        asm.handle_data_chunk(DataFrame(0, b"b" * 32, True))  # duplicate ignored
        asm.handle_data_chunk(DataFrame(2, b"c" * 32, False))  # CRC fail not stored
        assert asm.received_count == 1
        assert asm.crc_errors == 1
        assert asm.missing_chunks() == [1, 2, 3]
        assert not asm.is_complete

    def test_assemble_partial(self):
        asm = ChunkAssembler()
        asm.handle_metadata(self._meta(n=2, size=40, csize=32))
        asm.handle_data_chunk(DataFrame(1, b"z" * 8, True))
        data = asm.assemble()
        assert len(data) == 40
        assert data[32:] == b"z" * 8
        assert data[:32] == bytes(32)

    def test_persistence_and_resume(self, tmp_path):
        db = str(tmp_path / "chunks.db")
        asm = ChunkAssembler(db)
        asm.handle_metadata(self._meta(n=3, size=96, csize=32))
        asm.handle_data_chunk(DataFrame(0, b"x" * 32, True))
        asm.cleanup()
        # resume: same metadata keeps stored chunks
        asm2 = ChunkAssembler(db, resume=True)
        assert asm2.received_count == 1
        asm2.handle_metadata(self._meta(n=3, size=96, csize=32))
        assert asm2.received_count == 1
        assert asm2.missing_chunks() == [1, 2]
        asm2.handle_data_chunk(DataFrame(1, b"y" * 32, True))
        asm2.handle_data_chunk(DataFrame(2, b"w" * 32, True))
        assert asm2.is_complete
        assert asm2.assemble() == b"x" * 32 + b"y" * 32 + b"w" * 32
        asm2.cleanup()

    def test_fast_path_store_deferred_commit(self, tmp_path):
        """store_valid_chunk (BatchReceiver's vectorized consume) defers the
        sqlite commit to commit(); reads within the connection stay exact and
        durability lands at the round boundary / cleanup."""
        db = str(tmp_path / "c3.db")
        asm = ChunkAssembler(db)
        asm.handle_metadata(self._meta(n=3, size=96, csize=32))
        import numpy as np

        assert asm.store_valid_chunk(0, np.frombuffer(b"x" * 32, np.uint8))
        assert not asm.store_valid_chunk(0, b"y" * 32)  # duplicate suppressed
        assert not asm.store_valid_chunk(9, b"y" * 32)  # out of range
        assert asm.received_count == 1
        assert asm.missing_chunks() == [1, 2]  # uncommitted row still visible
        # reads flush the host-side buffer first (rows batch until
        # _FLUSH_ROWS accumulate, so a bare commit() is a no-op here)
        assert asm.assemble()[:32] == b"x" * 32
        asm.commit()
        assert asm.store_valid_chunk(1, b"y" * 32)
        asm.cleanup()  # commits the tail store
        asm2 = ChunkAssembler(db, resume=True)
        assert asm2.received_count == 2
        assert asm2.assemble()[:64] == b"x" * 32 + b"y" * 32
        asm2.cleanup()

    def test_batch_store_and_async_writer(self, tmp_path):
        """store_valid_chunks (whole-round consume fast path) + the shared
        AsyncBatchWriter: duplicate/overrun suppression, read-your-writes
        through the barrier, durability across resume, writer error surfaced."""
        import numpy as np

        from audio_modem_tpu.runtime.assembler import AsyncBatchWriter

        db = str(tmp_path / "c4.db")
        w = AsyncBatchWriter()
        asm = ChunkAssembler(db, writer=w)
        asm.handle_metadata(self._meta(n=6, size=192, csize=32))
        rows = np.arange(4 * 40, dtype=np.uint8).reshape(4, 40)
        assert asm.store_valid_chunks(np.array([0, 1, 1, 9]), rows, 7, 32) == 2
        assert asm.received_count == 2  # dup seq 1 + overrun 9 suppressed
        # reads flush the pending buffer AND drain the writer queue first
        got = asm.assemble()
        assert got[:32] == rows[0, 7:39].tobytes()
        assert got[32:64] == rows[1, 7:39].tobytes()
        # handle_data_chunk with a writer defers through the same buffer
        asm.handle_data_chunk(DataFrame(2, b"z" * 32, True))
        asm.cleanup()
        asm2 = ChunkAssembler(db, resume=True)
        assert asm2.received_count == 3
        assert asm2.assemble()[64:96] == b"z" * 32
        asm2.cleanup()
        # a writer-side failure (connection already closed) surfaces at the
        # next barrier, not silently
        import sqlite3

        dead = sqlite3.connect(":memory:", check_same_thread=False)
        dead.close()
        w.submit(dead, [(0, b"x")])
        with pytest.raises(sqlite3.ProgrammingError):
            w.barrier()
        w.close()

    def test_new_metadata_clears(self, tmp_path):
        db = str(tmp_path / "c2.db")
        asm = ChunkAssembler(db)
        asm.handle_metadata(self._meta(n=2, size=64, csize=32))
        asm.handle_data_chunk(DataFrame(0, b"x" * 32, True))
        asm.handle_metadata(self._meta(n=5, size=160, csize=32))  # different transfer
        assert asm.received_count == 0
        assert asm.missing_chunks() == [0, 1, 2, 3, 4]
        asm.cleanup()


def _feed(rx: StreamingReceiver, signal: np.ndarray, block: int = 4096):
    for off in range(0, len(signal), block):
        rx.process_audio_block(signal[off : off + block])
    rx.flush()


@pytest.mark.parametrize("mode_name", ["QPSK", "BPSK-NARROW"])
class TestStreamingReceiver:
    def test_chunked_transfer(self, mode_name):
        mode = MODES[mode_name]
        rng = np.random.default_rng(31)
        data = rng.bytes(mode.chunk_size * 2 + 123)  # 3 chunks
        frames = api.encode(b"", mode) if False else list(api.encode_chunked(data, mode, "big.bin"))
        signal = np.concatenate(frames)
        rx = StreamingReceiver(mode)
        _feed(rx, signal)
        assert rx.meta_received
        assert rx.assembler.is_complete, rx.assembler.missing_chunks()
        assert rx.assembler.assemble() == data
        assert rx.stats.frames_decoded == len(frames)
        assert rx.stats.frame_errors == 0

    def test_with_leading_noise_and_gap(self, mode_name):
        mode = MODES[mode_name]
        rng = np.random.default_rng(37)
        data = rng.bytes(mode.chunk_size + 17)  # 2 chunks
        frames = list(api.encode_chunked(data, mode, "n.bin"))
        noise = (rng.standard_normal(9000) * 0.001).astype(np.float32)
        signal = np.concatenate([noise] + frames)
        rx = StreamingReceiver(mode)
        _feed(rx, signal)
        assert rx.assembler.is_complete, rx.assembler.missing_chunks()
        assert rx.assembler.assemble() == data


class TestDecodeChunkedApi:
    def test_decode_chunked_roundtrip(self):
        mode = MODES["QPSK"]
        data = np.random.default_rng(41).bytes(mode.chunk_size * 2 + 50)
        signal = np.concatenate(list(api.encode_chunked(data, mode, "api.bin")))
        res = api.decode_chunked(signal, mode)
        assert not isinstance(res, framing.FrameError)
        assert res.complete and res.data == data and res.file_name == "api.bin"

    def test_encode_routing(self):
        small = api.encode(b"x" * 100, "QPSK")
        assert len(small) == 1
        big = api.encode(b"x" * (33 * 1024), "QPSK")
        assert len(big) == 1 + -(-33 * 1024 // MODES["QPSK"].chunk_size)


class TestChannelRobustness:
    def test_awgn_legacy(self):
        # BASELINE config 2 analog: repetition mode under AWGN
        mode = MODES["BPSK-REPEAT"]
        data = np.random.default_rng(43).bytes(120)
        sig = api.encode_legacy(data, mode, "awgn.bin")
        noisy = channel.apply_channel_np(sig, channel.ChannelSpec(snr_db=10.0), seed=1)
        result, _ = api.decode(noisy, mode)
        assert isinstance(result, framing.LegacyFrame), getattr(result, "error", result)
        assert result.crc_valid and result.data == data

    def test_multipath_qam16(self):
        # BASELINE config 4 analog: 16-QAM with echoes, pilot EQ must cope
        mode = MODES["16-QAM"]
        data = np.random.default_rng(47).bytes(2000)
        sig = api.encode_legacy(data, mode, "mp.bin")
        spec = channel.ChannelSpec(
            snr_db=28.0, multipath=((23, 0.25), (61, 0.12)), gain=0.7, dc_offset=0.01
        )
        received = channel.apply_channel_np(sig, spec, seed=2)
        result, _ = api.decode(received, mode)
        assert isinstance(result, framing.LegacyFrame), getattr(result, "error", result)
        assert result.crc_valid and result.data == data

    def test_streaming_awgn(self):
        mode = MODES["BPSK-ACOUSTIC"]
        data = np.random.default_rng(53).bytes(mode.chunk_size + 100)
        frames = list(api.encode_chunked(data, mode, "s.bin"))
        signal = np.concatenate(frames)
        noisy = channel.apply_channel_np(signal, channel.ChannelSpec(snr_db=15.0), seed=3)
        rx = StreamingReceiver(mode)
        _feed(rx, noisy)
        assert rx.assembler.is_complete, rx.assembler.missing_chunks()
        assert rx.assembler.assemble() == data


class TestClockDrift:
    def test_decode_under_clock_offset(self):
        """TX/RX sample-clock mismatch (channel.clock_drift): 50 ppm is a
        realistic sound-card offset; the CP + per-frame re-sync absorb it."""
        mode = MODES["BPSK-ACOUSTIC"]
        data = np.random.default_rng(83).bytes(150)
        sig = api.encode_legacy(data, mode, "d.bin")
        drifted = channel.apply_channel_np(sig, channel.ChannelSpec(clock_ppm=50.0))
        assert len(drifted) == len(sig)
        result, _ = api.decode(drifted, mode)
        assert isinstance(result, framing.LegacyFrame), getattr(result, "error", result)
        assert result.crc_valid and result.data == data


class TestStageTimer:
    def test_report(self):
        from audio_modem_tpu.utils.trace import StageTimer

        t = StageTimer()
        with t.stage("demod", samples=44100):
            pass
        rep = t.report()
        assert "demod" in rep and rep["demod"]["samples"] == 44100


class TestDropoutChannel:
    def test_dropout_burst_loses_only_affected_chunks(self):
        """A zeroed burst destroys at most the frames it overlaps; the
        receiver recovers on the next preamble (simplex loss model)."""
        mode = MODES["QPSK"]
        data = np.random.default_rng(89).bytes(mode.chunk_size * 3)  # 3 chunks
        frames = list(api.encode_chunked(data, mode, "drop.bin"))
        signal = np.concatenate(frames)
        # kill chunk 1's frame region entirely
        start = sum(len(f) for f in frames[:2])
        spec = channel.ChannelSpec(dropout=((start, len(frames[2])),))
        damaged = channel.apply_channel_np(signal, spec)
        rx = StreamingReceiver(mode)
        _feed(rx, damaged)
        missing = rx.assembler.missing_chunks()
        assert 1 in missing
        assert 0 not in missing and 2 not in missing
        # partial assembly zero-fills the hole
        out = rx.assembler.assemble()
        assert out[: mode.chunk_size] == data[: mode.chunk_size]
        assert out[2 * mode.chunk_size :] == data[2 * mode.chunk_size :]


class TestMediumScaleChunked:
    def test_quarter_megabyte_qpsk(self):
        """Scaled-down BASELINE config 3 (QPSK chunked multi-frame file)."""
        mode = MODES["QPSK"]
        data = np.random.default_rng(97).bytes(256 * 1024)
        res = api.decode_chunked(
            np.concatenate(list(api.encode_chunked(data, mode, "big.bin"))), mode
        )
        assert not isinstance(res, framing.FrameError)
        assert res.complete, res.missing_chunks
        assert res.data == data
        assert res.total_chunks == 128


class TestStreamingStress:
    def test_many_frames_random_gaps_and_bursts(self):
        """Robustness: 10 chunks with random inter-frame noise gaps and one
        frame destroyed by a burst; everything else must arrive."""
        mode = MODES["BPSK-ACOUSTIC"]
        rng = np.random.default_rng(101)
        data = rng.bytes(mode.chunk_size * 9 + 37)  # 10 chunks
        frames = list(api.encode_chunked(data, mode, "stress.bin"))
        parts = []
        for f in frames:
            parts.append((rng.standard_normal(int(rng.integers(0, 5000))) * 0.003).astype(np.float32))
            parts.append(f)
        signal = np.concatenate(parts)
        # destroy data frame for chunk 4 (frames[0] is metadata)
        start = sum(len(x) for x in parts[: 2 * 5 + 1])
        dead = len(frames[5])
        signal[start : start + dead] = (rng.standard_normal(dead) * 0.05).astype(np.float32)
        rx = StreamingReceiver(mode)
        _feed(rx, signal)
        missing = rx.assembler.missing_chunks()
        assert missing == [4], (missing, rx.stats)
        out = rx.assembler.assemble()
        cs = mode.chunk_size
        assert out[: 4 * cs] == data[: 4 * cs]
        assert out[5 * cs :] == data[5 * cs :]


class TestSuccessiveTransfers:
    def test_two_files_one_receiver(self):
        """A second metadata frame starts a fresh transfer (app.js:610-626);
        completed files are delivered via on_file before the reset."""
        mode = MODES["QPSK"]
        rng = np.random.default_rng(111)
        file_a = rng.bytes(mode.chunk_size + 5)
        file_b = rng.bytes(2 * mode.chunk_size + 11)
        sig = np.concatenate(
            list(api.encode_chunked(file_a, mode, "a.bin"))
            + list(api.encode_chunked(file_b, mode, "b.bin"))
        )
        received = {}
        rx = StreamingReceiver(mode, on_file=lambda name, data: received.__setitem__(name, data))
        _feed(rx, sig)
        assert received.get("a.bin") == file_a
        assert received.get("b.bin") == file_b


class TestAssembleToFile:
    def test_streaming_disk_assembly(self, tmp_path):
        from audio_modem_tpu.runtime.assembler import ChunkAssembler

        asm = ChunkAssembler()
        asm.handle_metadata(MetaFrame(3, 70, 32, "d.bin", True))
        asm.handle_data_chunk(DataFrame(0, b"a" * 32, True))
        asm.handle_data_chunk(DataFrame(2, b"c" * 6, True))  # final short chunk
        out = tmp_path / "out.bin"
        n = asm.assemble_to_file(str(out))
        assert n == 70
        data = out.read_bytes()
        assert data == b"a" * 32 + bytes(32) + b"c" * 6
        assert data == asm.assemble()


class TestChunkedClockDrift:
    """VERDICT r2 item 7: chunked transfers under TX/RX clock drift. Each
    frame re-syncs at its own preamble (absorbing CUMULATIVE session drift),
    and the chunk-decode ladder's timing-tracked retry
    (decoder._chunk_tracked_core) recovers the WITHIN-frame drift that walks
    fixed symbol windows off the CP — the reference's phase-only pilot
    correction (modem.js:397-405) cannot decode these frames."""

    @pytest.mark.parametrize("ppm", [100.0, -100.0])
    def test_qpsk_21_frames_100ppm(self, ppm):
        mode = MODES["QPSK"]
        rng = np.random.default_rng(19)
        data = rng.bytes(mode.chunk_size * 20 + 100)  # 21 data frames
        sig = np.concatenate(list(api.encode_chunked(data, mode, "d.bin", batch=8)))
        drifted = channel.apply_channel_np(sig, channel.ChannelSpec(clock_ppm=ppm))
        res = api.decode_chunked(drifted, mode)
        assert not isinstance(res, framing.FrameError)
        assert res.complete, res.missing_chunks
        assert res.data == data

    def test_acoustic_long_frames_150ppm(self):
        """~126k-sample acoustic chunk frames (512 B at x1 BPSK would be
        ~19 samples of within-frame drift at 150 ppm — far past anything
        the pilot phase average tolerates)."""
        mode = MODES["BPSK-ACOUSTIC"]
        rng = np.random.default_rng(23)
        data = rng.bytes(mode.chunk_size * 3)  # several long frames
        sig = np.concatenate(list(api.encode_chunked(data, mode, "a.bin", batch=4)))
        drifted = channel.apply_channel_np(sig, channel.ChannelSpec(clock_ppm=150.0))
        res = api.decode_chunked(drifted, mode)
        assert not isinstance(res, framing.FrameError)
        assert res.complete, res.missing_chunks
        assert res.data == data
