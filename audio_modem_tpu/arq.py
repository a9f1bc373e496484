"""ARQ extension: missing-chunk retransmission sessions.

The reference's protocol spec describes ACK/NACK selective-repeat ARQ
(docs/protocol_spec.md:43-63) that its simplex implementation never ships —
receivers can only report missing chunks out-of-band (app.js:659-665). This
module completes the spec:

Wire (extension frame, same PHY):
  request: [0xFC][count:2][seqNum:4 x count][CRC32:4]
     count == 0 means "transfer complete" (ACK-all).

Session layer: selective-repeat over any pair of unidirectional channels
(functions mapping a TX signal to the peer's RX signal — loopback, the
channel simulator, or real audio I/O). The forward link carries
metadata/data frames; the back link carries request frames. Rounds continue
until the receiver ACKs or ``max_rounds`` is hit; the return value reports
per-round chunk counts so tests can assert retransmission actually happened.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

import jax.numpy as jnp

from audio_modem_tpu import decoder, framing, sync
from audio_modem_tpu.configs import ModemMode
from audio_modem_tpu.ops.bits import bits_to_bytes, majority_vote, soft_combine
from audio_modem_tpu.ops.crc32 import crc32
from audio_modem_tpu.runtime.receiver import StreamingReceiver

FRAME_REQUEST = 0xFC
MAX_SEQS_PER_REQUEST = 256


def build_request_payload(missing: list[int]) -> bytes:
    """[0xFC][count:2][seq:4 x count][CRC:4]; count 0 = ACK-all."""
    seqs = missing[:MAX_SEQS_PER_REQUEST]
    body = bytes([FRAME_REQUEST]) + len(seqs).to_bytes(2, "big")
    for s in seqs:
        body += int(s).to_bytes(4, "big")
    return body + crc32(body).to_bytes(4, "big")


@dataclasses.dataclass
class RequestFrame:
    missing: list[int]
    crc_valid: bool
    frame_type: int = FRAME_REQUEST

    @property
    def is_ack(self) -> bool:
        return not self.missing


def parse_request(by: bytes) -> RequestFrame | framing.FrameError:
    if len(by) < 7 or by[0] != FRAME_REQUEST:
        return framing.FrameError("Not a request frame")
    count = int.from_bytes(by[1:3], "big")
    off = 3 + 4 * count
    if off + 4 > len(by):
        return framing.FrameError("Request frame truncated")
    seqs = [int.from_bytes(by[3 + 4 * i : 7 + 4 * i], "big") for i in range(count)]
    expected = int.from_bytes(by[off : off + 4], "big")
    return RequestFrame(seqs, expected == crc32(by[:off]))


def build_request_frame(missing: list[int], mode: ModemMode) -> np.ndarray:
    """Request payload -> full OFDM frame on the back link."""
    p = mode.profile
    return framing.synthesize_frame(
        build_request_payload(missing), mode, p.silence_pre_chunk(True), p.silence_post_chunk()
    )


@dataclasses.dataclass
class ArqReport:
    complete: bool
    rounds: int
    chunks_sent_per_round: list[int]
    data: bytes
    file_name: str


def run_arq_session(
    data: bytes,
    mode: ModemMode,
    file_name: str,
    forward: Callable[[np.ndarray], np.ndarray],
    backward: Callable[[np.ndarray], np.ndarray] | None = None,
    max_rounds: int = 5,
    fec: bool = False,
) -> ArqReport:
    """Selective-repeat transfer over simulated (or real) duplex channels.

    ``forward``/``backward`` map a transmitted signal to what the peer
    receives (identity for loopback; channel.apply_channel_np for fault
    injection). Round 1 sends metadata + every chunk; each later round
    resends only the chunks the receiver reported missing. The back link
    carries request frames; a corrupted request falls back to "resend all
    still-missing" knowledge from the last good report (here: retry the
    request once, then give up the round).
    """
    backward = backward or (lambda s: s)
    chunk_size = mode.chunk_size
    total_chunks = -(-len(data) // chunk_size)

    rx = StreamingReceiver(mode, fec=fec)
    sent_per_round: list[int] = []

    def send_frames(frames: list[np.ndarray]) -> None:
        signal = forward(np.concatenate(frames))
        for off in range(0, len(signal), 4096):
            rx.process_audio_block(signal[off : off + 4096])
        rx.flush()

    # round 1: metadata + all chunks
    frames = [framing.build_metadata_frame(total_chunks, len(data), chunk_size, file_name, mode, fec=fec)]
    frames += [
        framing.build_data_chunk_frame(data[s * chunk_size : (s + 1) * chunk_size], s, mode, fec=fec)
        for s in range(total_chunks)
    ]
    send_frames(frames)
    sent_per_round.append(total_chunks)

    rounds = 1
    while rounds < max_rounds:
        # back link: receiver reports missing (or ACKs)
        missing = rx.assembler.missing_chunks() if rx.meta_received else list(range(total_chunks))
        req_sig = backward(build_request_frame(missing, mode))
        req = _decode_request(req_sig, mode)
        if isinstance(req, framing.FrameError) or not req.crc_valid:
            rounds += 1
            continue  # lost/corrupt request: sender retries next round
        if req.is_ack:
            break
        resend = [
            framing.build_data_chunk_frame(data[s * chunk_size : (s + 1) * chunk_size], s, mode, fec=fec)
            for s in req.missing
        ]
        # re-send metadata too in case it was lost
        if not rx.meta_received:
            resend.insert(0, framing.build_metadata_frame(total_chunks, len(data), chunk_size, file_name, mode, fec=fec))
        send_frames(resend)
        sent_per_round.append(len(req.missing))
        rounds += 1
        if rx.assembler.is_complete:
            break

    out = rx.assembler.assemble() if rx.meta_received else b""
    report = ArqReport(
        complete=rx.assembler.is_complete,
        rounds=rounds,
        chunks_sent_per_round=sent_per_round,
        data=out,
        file_name=rx.assembler.file_name,
    )
    rx.cleanup()
    return report


def _decode_request(signal: np.ndarray, mode: ModemMode) -> RequestFrame | framing.FrameError:
    """Full-signal decode of a request frame with decode_signal's full
    retry ladder behind it: the public retry-loop decode
    (decoder.decode_raw — false-positive resume), then on failure the
    xcorr sync re-acquisition with a frame-aligned decode, with soft
    repetition combining for the x3-repetition back-link modes. A noisy
    return channel is the ARQ session's weakest link; the reference has no
    return channel at all (spec-promised, never shipped)."""
    raw, info = decoder.decode_raw(signal, mode)
    result: RequestFrame | framing.FrameError
    if isinstance(raw, framing.FrameError):
        result = raw
    else:
        result = parse_request(raw)
        if isinstance(result, RequestFrame) and result.crc_valid:
            return result
    # xcorr re-acquisition (see decoder.decode_signal)
    p = mode.profile
    sym = p.symbol_len
    n_valid = len(signal)
    pad_len = decoder._bucket_len(n_valid)
    sig = np.zeros(pad_len, np.float32)
    sig[:n_valid] = signal
    xi, xm = decoder._xcorr_core(jnp.asarray(sig), jnp.int32(n_valid), mode)
    xstart = int(xi)
    if float(xm) < sync.XCORR_THRESHOLD or xstart < 0:
        return result
    # symbol-count bucketing (decoder.pad_aligned_frame): an arbitrary
    # xstart tail must not trigger a fresh 20-100 s remote compile per length
    padded = decoder.pad_aligned_frame(np.asarray(signal[xstart:], np.float32), mode)
    if isinstance(padded, framing.FrameError):
        return result
    fdev, n_sym, n_bucket = padded
    bits = np.asarray(decoder._chunk_core(fdev, mode, n_bucket))[: n_sym * mode.bits_per_symbol]
    b = majority_vote(bits, mode.repetition) if mode.repetition > 1 else bits
    retry = parse_request(bytes(bits_to_bytes(b)))
    if isinstance(retry, RequestFrame) and retry.crc_valid:
        return retry
    if decoder._soft_retry_applicable(mode):
        soft = np.asarray(decoder._chunk_soft_core(fdev, mode, n_bucket))
        soft_b = soft_combine(soft[: n_sym * mode.bits_per_symbol], mode.repetition)
        soft_retry = parse_request(bytes(bits_to_bytes(soft_b)))
        if isinstance(soft_retry, RequestFrame) and soft_retry.crc_valid:
            return soft_retry
    return result
