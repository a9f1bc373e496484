"""Benchmark: batched streaming-demod throughput on one chip.

Prints ONE JSON line:
  metric       demod Msamples/s/chip on the full receive pipeline
               (preprocess + Schmidl-Cox detect + xcorr refine + CE + EQ +
               demap) over a 64-stream batch of QPSK chunk frames
  vs_baseline  value / 44.1 — multiples of the BASELINE.json target of
               1000x real-time demodulation per chip at 44.1 kHz
               (the reference JS processes ~1x real time per core)

Extra context (frame demod-only throughput, frames/s, detect p50 latency,
payload correctness) goes in "details".
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    # Persistent compilation cache: the per-mode matrix compiles ~10 fresh
    # executables and every fresh compile goes through the remote relay
    # (20-100 s each); caching makes reruns (and the driver's round-end
    # bench) take seconds instead of ~25 minutes.
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_amt_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from audio_modem_tpu import framing
    from audio_modem_tpu.configs import MODES
    from audio_modem_tpu.ops.bits import bits_to_bytes
    from audio_modem_tpu.framing import parse_payload_bytes, DataFrame
    from audio_modem_tpu.parallel.batch import (
        batch_decode_chunk_frames,
        batch_decode_signals,
        pad_signals,
    )

    mode = MODES["QPSK"]
    p = mode.profile
    sym = p.symbol_len
    chunk_size = mode.chunk_size  # 2048
    n_streams = 64

    # one frame per stream, distinct payloads
    rng = np.random.default_rng(0)
    frames = [
        framing.build_data_chunk_frame(rng.bytes(chunk_size), seq, mode)
        for seq in range(8)
    ]
    frames = frames * (n_streams // len(frames))
    signals, n_valid = pad_signals(frames)
    pad_len = signals.shape[1]
    n_payload_sym = framing.num_symbols_for_payload(chunk_size + 11, mode)
    max_syms = max((pad_len - 3 * sym) // sym, 1)

    sig_dev = jax.device_put(jnp.asarray(signals))
    nv_dev = jax.device_put(jnp.asarray(n_valid))

    # ---- full pipeline (detect + refine + demod) ----
    full = jax.jit(lambda s, nv: batch_decode_signals(s, nv, mode, max_syms))
    out = jax.block_until_ready(full(sig_dev, nv_dev))  # compile + warm
    assert bool(np.asarray(out["detected"]).all()), "bench decode failed detection"

    # correctness spot-check: stream 0 payload must parse with valid CRC
    start0 = int(np.asarray(out["start"])[0])
    n_sym0 = (int(n_valid[0]) - (start0 + 3 * sym)) // sym
    bits0 = np.asarray(out["bits"][0])[: n_sym0 * mode.bits_per_symbol]
    parsed = parse_payload_bytes(bits_to_bytes(bits0))
    assert isinstance(parsed, DataFrame) and parsed.crc_valid, "bench payload corrupt"

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = full(sig_dev, nv_dev)
    jax.block_until_ready(out)
    dt_full = time.perf_counter() - t0
    total_samples = int(n_valid.sum()) * iters
    msps_full = total_samples / dt_full / 1e6

    # ---- frame-aligned demod only (post-sync path) ----
    aligned = np.stack([f[p.silence_pre_chunk(False) :][: (3 + n_payload_sym) * sym] for f in frames])
    aligned_dev = jax.device_put(jnp.asarray(aligned))
    demod = jax.jit(lambda f: batch_decode_chunk_frames(f, mode, n_payload_sym))
    jax.block_until_ready(demod(aligned_dev))
    t0 = time.perf_counter()
    for _ in range(iters):
        bits = demod(aligned_dev)
    jax.block_until_ready(bits)
    dt_demod = time.perf_counter() - t0
    msps_demod = aligned.size * iters / dt_demod / 1e6
    frames_per_sec = n_streams * iters / dt_full

    # ---- detect-only p50 latency (one stream window) ----
    from audio_modem_tpu import sync

    # ---- encode-side throughput (batched modulate + frame synthesis) ----
    from audio_modem_tpu import phy
    from audio_modem_tpu.framing import payload_to_bits, build_data_chunk_payload

    bits_one = payload_to_bits(build_data_chunk_payload(rng.bytes(chunk_size), 0), mode)
    bits_batch = jax.device_put(jnp.asarray(np.tile(bits_one, (n_streams, 1))))
    enc = jax.jit(lambda b: phy.modulate(b, mode))
    jax.block_until_ready(enc(bits_batch))
    t0 = time.perf_counter()
    for _ in range(iters):
        enc_out = enc(bits_batch)
    jax.block_until_ready(enc_out)
    dt_enc = time.perf_counter() - t0
    enc_msps = n_streams * n_payload_sym * sym * iters / dt_enc / 1e6

    # ---- per-mode full-pipeline Msps (all profiles x constellations) ----
    # Catches regressions in acoustic/narrowband matmul shapes (CP 128/256)
    # and the 16/64-QAM demap cost that the QPSK headline can't see.
    per_mode = {}
    for mode_name in ("QPSK", "16-QAM", "64-QAM", "BPSK-ACOUSTIC", "BPSK-NARROW"):
        m = MODES[mode_name]
        msym = m.profile.symbol_len
        payload = 512 if "BPSK" in mode_name else m.chunk_size
        mframes = [
            framing.build_data_chunk_frame(rng.bytes(payload), seq, m) for seq in range(8)
        ] * 8
        msignals, mnv = pad_signals(mframes)
        mmax_syms = max((msignals.shape[1] - 3 * msym) // msym, 1)
        ms_dev = jax.device_put(jnp.asarray(msignals))
        mnv_dev = jax.device_put(jnp.asarray(mnv))
        mfull = jax.jit(lambda s, nv, m=m, k=mmax_syms: batch_decode_signals(s, nv, m, k))
        mout = jax.block_until_ready(mfull(ms_dev, mnv_dev)["detected"])
        assert bool(np.asarray(mout).all()), f"{mode_name} bench decode failed detection"
        t0 = time.perf_counter()
        for _ in range(iters):
            mo = mfull(ms_dev, mnv_dev)
        jax.block_until_ready(mo["bits"])
        per_mode[mode_name] = round(int(mnv.sum()) * iters / (time.perf_counter() - t0) / 1e6, 1)

    # Pipelined per-call time at depth 10: a single blocking call through the
    # axon tunnel pays a ~28 ms relay round-trip that a local runtime would
    # not; pipelining amortizes it and reflects the device-side cost.
    one = jax.jit(lambda s, nv: sync.detect_preamble(s, p, nv))
    s1, nv1 = sig_dev[0], nv_dev[0]
    jax.block_until_ready(one(s1, nv1))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        outs = [one(s1, nv1) for _ in range(10)]
        jax.block_until_ready(outs)
        lats.append((time.perf_counter() - t0) / 10)
    p50_detect_ms = float(np.median(lats) * 1e3)

    # ---- 512-stream scale point (amortizes tunnel dispatch, shows the
    # device's real ceiling) ----
    sig512 = jax.device_put(jnp.tile(jnp.asarray(signals), (8, 1)))
    nv512 = jax.device_put(jnp.tile(jnp.asarray(n_valid), (8,)))
    full512 = jax.jit(lambda s, nv: batch_decode_signals(s, nv, mode, max_syms))
    jax.block_until_ready(full512(sig512, nv512))
    t0 = time.perf_counter()
    for _ in range(iters):
        out512 = full512(sig512, nv512)
    jax.block_until_ready(out512)
    msps_512 = sig512.size * iters / (time.perf_counter() - t0) / 1e6

    realtime_x = msps_full * 1e6 / 44100.0
    print(
        json.dumps(
            {
                "metric": "streaming demod Msamples/s/chip (64-stream QPSK, full pipeline)",
                "value": round(msps_full, 2),
                "unit": "Msamples/s",
                "vs_baseline": round(msps_full / 44.1, 3),
                "details": {
                    "realtime_streams_per_chip": round(realtime_x, 0),
                    "batch512_full_pipeline_msps": round(msps_512, 2),
                    "batch512_realtime_streams": round(msps_512 * 1e6 / 44100.0, 0),
                    "frame_demod_only_msps": round(msps_demod, 2),
                    "encode_modulate_msps": round(enc_msps, 2),
                    "frames_per_sec": round(frames_per_sec, 1),
                    "p50_detect_latency_ms": round(p50_detect_ms, 3),
                    "platform": jax.devices()[0].platform,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
