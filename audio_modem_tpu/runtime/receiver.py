"""Streaming receiver FSM (app.js:706-998), host control + device compute.

Per audio block: EMA DC removal -> ring write -> state dispatch:
  IDLE               incremental preamble scan over newly-covered positions
                     (device windowed-correlation kernel, first-peak commit)
  PREAMBLE_DETECTED  fine xcorr refinement around the candidate (device);
                     false positive -> back to IDLE (app.js:879-884)
  COLLECTING_FRAME   wait until expectedFrameEnd worth of samples exist
  DEMODULATING       extract + per-frame peak normalization + decode, route
                     meta/data frames into the ChunkAssembler, resume the
                     scan at expectedFrameEnd (app.js:907-981)

Control flow (a few comparisons per block) stays on host; all signal math
runs in jitted device code with static shape buckets.
"""

from __future__ import annotations

import enum
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from audio_modem_tpu import decoder, framing, sync
from audio_modem_tpu.configs import ModemMode
from audio_modem_tpu.runtime.assembler import ChunkAssembler
from audio_modem_tpu.runtime.ring import RingBuffer
from audio_modem_tpu.utils import log
from audio_modem_tpu.utils.metrics import StreamStats

# Streaming scan uses a lower energy gate than the offline path (app.js:796)
STREAM_MIN_ENERGY = 0.001
# Pre-meta frames are bounded by the metadata payload size (app.js:888-896)
PRE_META_MAX_PAYLOAD = 280
SCAN_BUCKET = 8192


class RecvState(enum.Enum):
    IDLE = 0
    PREAMBLE_DETECTED = 1
    COLLECTING_FRAME = 2
    DEMODULATING = 3


@partial(jax.jit, static_argnames=("profile",))
def _scan_window(window: jnp.ndarray, n_valid: jnp.ndarray, profile):
    return sync.detect_preamble(window, profile, n_valid, min_energy=STREAM_MIN_ENERGY, stride=sync.COARSE_STRIDE)


@partial(jax.jit, static_argnames=("profile", "pad_len"))
def _refine_window(window: jnp.ndarray, coarse_rel: jnp.ndarray, n_valid: jnp.ndarray, profile, pad_len: int):
    return sync.refine_xcorr(window, coarse_rel, profile, n_valid)


class StreamingReceiver:
    """One stream's receive pipeline. For many concurrent streams use
    parallel.batch_receiver, which shares one batched device program."""

    def __init__(
        self,
        mode: ModemMode,
        persist_path: str | None = None,
        resume: bool = False,
        on_file: Callable[[str, bytes], None] | None = None,
        dc_alpha: float = 0.999,
        fec: bool = False,
    ):
        self.mode = mode
        self.fec = fec
        p = mode.profile
        max_payload = max(mode.chunk_size, 4096) + 16
        if fec:
            max_payload = framing.fec_wire_len(max_payload)
        max_frame = framing.estimate_frame_samples(max_payload, mode)
        self.ring = RingBuffer(max_frame * 3 + 8192)
        self.assembler = ChunkAssembler(persist_path, resume)
        self.stats = StreamStats()
        self.on_file = on_file

        self.state = RecvState.IDLE
        self.meta_received = False
        self.scan_pos = 0  # next global position to evaluate
        self.preamble_pos = -1
        self.expected_frame_end = -1

        self.dc_alpha = dc_alpha
        self.dc_mean = 0.0
        self._half = p.fft_size // 2

    # ---- ingest ----

    def process_audio_block(self, samples: np.ndarray) -> None:
        cleaned = self._remove_dc(np.asarray(samples, dtype=np.float32))
        self.ring.write(cleaned)
        self._step()

    def _remove_dc(self, x: np.ndarray) -> np.ndarray:
        """EMA DC tracker (app.js:750-755): native C++ sequential loop, with
        a closed-form numpy fallback inside audio_modem_tpu.native."""
        from audio_modem_tpu import native

        cleaned, self.dc_mean = native.ema_dc_removal(x, self.dc_alpha, self.dc_mean)
        return cleaned

    def _step(self) -> None:
        progressed = True
        while progressed:
            progressed = False
            if self.state is RecvState.IDLE:
                progressed = self._scan()
            elif self.state is RecvState.PREAMBLE_DETECTED:
                progressed = self._refine()
            elif self.state is RecvState.COLLECTING_FRAME:
                progressed = self._check_complete()

    # ---- IDLE: incremental scan ----

    def _scan(self) -> bool:
        p = self.mode.profile
        total = self.ring.total_written
        oldest = total - self.ring.capacity
        self.scan_pos = max(self.scan_pos, oldest, 0)
        scan_end = total - 2 * self._half  # last evaluable position
        if self.scan_pos > scan_end:
            return False

        # evaluate positions [scan_pos, scan_end] in bucketed windows
        while self.scan_pos <= scan_end:
            n_pos = min(scan_end - self.scan_pos + 1, SCAN_BUCKET - 2 * self._half)
            win_len = n_pos + 2 * self._half - 1
            window = self.ring.get_range(self.scan_pos, win_len)
            if window is None:
                self.scan_pos = max(self.scan_pos, self.ring.total_written - self.ring.capacity)
                continue
            padded = np.zeros(SCAN_BUCKET, np.float32)
            padded[:win_len] = window
            idx, best = _scan_window(jnp.asarray(padded), jnp.int32(win_len), p)
            idx = int(idx)
            if idx >= 0:
                self.preamble_pos = self.scan_pos + idx
                # Advance only past the committed peak (not the whole window)
                # so a later true preamble in the same window is re-scanned
                # after a refinement false-positive (app.js keeps acScanPos at
                # the drop-commit point for the same reason).
                self.scan_pos = self.preamble_pos + self._half
                self.state = RecvState.PREAMBLE_DETECTED
                return True
            self.scan_pos += n_pos
        return False

    # ---- PREAMBLE_DETECTED: fine xcorr ----

    def _refine(self) -> bool:
        p = self.mode.profile
        plen = p.symbol_len
        radius = 3 * p.cp_len
        needed = self.preamble_pos + plen + radius
        if self.ring.total_written < needed:
            return False  # wait for more samples (app.js:860-862)

        lo = max(self.ring.total_written - self.ring.capacity, self.preamble_pos - radius, 0)
        region_len = 2 * radius + plen
        region = self.ring.get_range(lo, min(region_len, self.ring.available_from(lo)))
        if region is None:
            self._reset_to_idle()
            return True
        pad_len = region_len + plen
        padded = np.zeros(pad_len, np.float32)
        padded[: len(region)] = region
        best_rel, metric = _refine_window(
            jnp.asarray(padded),
            jnp.int32(self.preamble_pos - lo),
            jnp.int32(len(region)),
            p,
            pad_len,
        )
        if float(metric) < sync.XCORR_THRESHOLD:
            # false positive -> back to scanning (app.js:879-884)
            self.state = RecvState.IDLE
            return True
        # refine_xcorr returns an index relative to its input window
        self.preamble_pos = lo + int(best_rel)
        max_payload = (
            (self.assembler.chunk_size or 4096) + 11 if self.meta_received else PRE_META_MAX_PAYLOAD
        )
        if self.fec:
            max_payload = framing.fec_wire_len(max_payload)
        frame_samples = framing.estimate_frame_samples(max_payload, self.mode)
        self.expected_frame_end = self.preamble_pos + frame_samples
        self.state = RecvState.COLLECTING_FRAME
        return True

    # ---- COLLECTING / DEMODULATING ----

    def _check_complete(self) -> bool:
        if self.ring.total_written < self.expected_frame_end:
            return False
        self.state = RecvState.DEMODULATING
        self._demodulate_frame()
        return True

    def _demodulate_frame(self, partial_ok: bool = False) -> None:
        frame_len = self.expected_frame_end - self.preamble_pos
        if partial_ok:
            frame_len = min(frame_len, self.ring.available_from(self.preamble_pos))
        frame = self.ring.get_range(self.preamble_pos, frame_len)
        if frame is None:
            self.stats.frame_errors += 1
            self._reset_to_idle()
            return
        mx = np.abs(frame).max()
        if mx > 1e-6:
            frame = frame / mx  # per-frame normalization (app.js:918-925)
        result = decoder.decode_chunk_frame(frame, self.mode)
        resume_pos = None
        if isinstance(result, framing.FrameError):
            self.stats.frame_errors += 1
            log.frame_error(result.error, pos=self.preamble_pos)
            # Unknown frame length: skip the header and rescan the region
            # (the xcorr refinement rejects data-region false peaks).
            resume_pos = self.preamble_pos + 4 * self.mode.profile.symbol_len
        else:
            self.stats.frames_decoded += 1
            if isinstance(result, framing.MetaFrame):
                if result.crc_valid:
                    self.assembler.handle_metadata(result)
                    self.meta_received = True
                    self.stats.total_chunks = result.total_chunks
                    log.frame_decoded("meta", file=result.file_name, chunks=result.total_chunks)
                else:
                    self.stats.frame_errors += 1
                    log.frame_error("metadata CRC", pos=self.preamble_pos)
            elif isinstance(result, framing.DataFrame):
                self.assembler.handle_data_chunk(result)
                self.stats.crc_errors = self.assembler.crc_errors
                self.stats.chunks_received = self.assembler.received_count
                log.chunk_received(result.seq_num, self.assembler.total_chunks, crc_ok=result.crc_valid)
                if self.assembler.is_complete:
                    log.transfer_complete(self.assembler.file_name, self.assembler.total_file_size)
                    if self.on_file is not None:
                        self.on_file(self.assembler.file_name, self.assembler.assemble())
            # Resume at the frame's ACTUAL length, computed from the decoded
            # payload, instead of the reference's worst-case estimate
            # (app.js:888-896 + 974-981) which overshoots short frames and
            # loses the next frames entirely (e.g. every pre-meta narrowband
            # frame). Bounded by the collected window for CRC-garbage safety.
            payload_len = None
            if isinstance(result, framing.MetaFrame) and result.crc_valid:
                payload_len = 12 + len(result.file_name.encode("utf-8")) + 4
            elif isinstance(result, framing.DataFrame) and result.crc_valid:
                payload_len = 11 + len(result.data)
            if payload_len is not None:
                if self.fec:
                    payload_len = framing.fec_wire_len(payload_len)
                actual = framing.estimate_frame_samples(payload_len, self.mode)
                resume_pos = min(
                    self.preamble_pos + actual,
                    self.expected_frame_end if self.expected_frame_end > 0 else self.preamble_pos + actual,
                )
        self._reset_to_idle(resume_pos)

    def _reset_to_idle(self, resume_pos: int | None = None) -> None:
        """Resume scanning after the current frame (app.js:974-981)."""
        if resume_pos is not None:
            self.scan_pos = resume_pos
        elif self.expected_frame_end > 0:
            self.scan_pos = self.expected_frame_end
        elif self.preamble_pos > 0:
            self.scan_pos = self.preamble_pos + self.mode.profile.symbol_len
        self.preamble_pos = -1
        self.expected_frame_end = -1
        self.state = RecvState.IDLE

    def flush(self) -> None:
        """End of input: try to decode a partially collected frame (stop with
        partial assembly, app.js:1142-1160)."""
        if self.state in (RecvState.PREAMBLE_DETECTED, RecvState.COLLECTING_FRAME) and self.preamble_pos >= 0:
            have = self.ring.available_from(self.preamble_pos)
            if have >= 4 * self.mode.profile.symbol_len:
                if self.expected_frame_end < 0:
                    self.expected_frame_end = self.preamble_pos + have
                self._demodulate_frame(partial_ok=True)

    def cleanup(self) -> None:
        self.assembler.cleanup()
