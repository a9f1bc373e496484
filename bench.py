"""Benchmark: batched streaming-demod throughput on one chip.

Prints ONE JSON line (stdout):
  metric       demod Msamples/s/chip on the full receive pipeline
               (preprocess + Schmidl-Cox detect + xcorr refine + CE + EQ +
               demap) over a 64-stream batch of QPSK chunk frames
  vs_baseline  value / 44.1 — multiples of the BASELINE.json target of
               1000x real-time demodulation per chip at 44.1 kHz
               (the reference JS processes ~1x real time per core)

Extra context (512-stream scale point, frame demod-only throughput,
encode throughput, per-mode matrix, frames/s, detect p50 latency) goes in
"details" — each stage is optional and budget-gated so the headline ALWAYS
prints: first jit compiles go through a remote relay at 20-100 s each, and
a full cold run can exceed an outer timeout. Progress goes to stderr.
Budget via AMT_BENCH_BUDGET_S (default 1500 s).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

T0 = time.time()
BUDGET = float(os.environ.get("AMT_BENCH_BUDGET_S", "1500"))


def log(msg: str) -> None:
    print(f"[bench +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def left() -> float:
    return BUDGET - (time.time() - T0)


def main() -> None:
    import jax

    # Persistent compilation cache: every fresh compile goes through the
    # remote-compile relay (20-100 s); caching makes reruns (and the
    # driver's round-end bench) take seconds instead of tens of minutes.
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
    iters = 10
    details: dict = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }
    skipped: list[str] = []

    log(f"building {n_streams} QPSK frames")
    rng = np.random.default_rng(0)
    # ONE batched synthesis call: sequential per-frame builds each pay a
    # full tunnel round trip (observed ~28 s/frame on a cold tunnel)
    frames = list(
        framing.build_data_chunk_frames([rng.bytes(chunk_size) for _ in range(8)], 0, mode)
    )
    frames = frames * (n_streams // len(frames))
    signals, n_valid = pad_signals(frames)
    pad_len = signals.shape[1]
    n_payload_sym = framing.num_symbols_for_payload(chunk_size + 11, mode)
    max_syms = max((pad_len - 3 * sym) // sym, 1)

    sig_dev = jax.device_put(jnp.asarray(signals))
    nv_dev = jax.device_put(jnp.asarray(n_valid))

    # ---- headline: full pipeline (detect + refine + demod), 64 streams ----
    log("compiling full pipeline (64 streams)")
    full = jax.jit(lambda s, nv: batch_decode_signals(s, nv, mode, max_syms))
    out = jax.block_until_ready(full(sig_dev, nv_dev))  # compile + warm
    assert bool(np.asarray(out["detected"]).all()), "bench decode failed detection"

    # correctness spot-check: stream 0 payload must parse with valid CRC
    start0 = int(np.asarray(out["start"])[0])
    n_sym0 = (int(n_valid[0]) - (start0 + 3 * sym)) // sym
    bits0 = np.asarray(out["bits"][0])[: n_sym0 * mode.bits_per_symbol]
    parsed = parse_payload_bytes(bits_to_bytes(bits0))
    assert isinstance(parsed, DataFrame) and parsed.crc_valid, "bench payload corrupt"

    log("timing single-frame full pipeline (detail)")
    # best of 5 reps: the first pipelined loop after a fresh compile can
    # carry remote-relay/tunnel warmup latency (observed 2-3x slow), and
    # tunnel RTT jitter adds run-to-run variance on top
    dt_1f = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = full(sig_dev, nv_dev)
        jax.block_until_ready(out)
        dt_1f = min(dt_1f, time.perf_counter() - t0)
    msps_1f = int(n_valid.sum()) * iters / dt_1f / 1e6
    details["headline_1frame_msps"] = round(msps_1f, 2)
    log(f"single-frame-per-dispatch (r1-r4 headline definition): {msps_1f:.1f} Msps")

    # ---- OFFICIAL HEADLINE: steady-state K-frame turbo round ----
    # One dispatch decodes K frames per stream (scan slot 0 + K-1 cadence-
    # predicted refine+demods) — the runtime's actual sustained program
    # (parallel/multi_receiver._batch_window_decode_multi, what BatchReceiver
    # dispatches every steady-state round). The r1-r4 headline dispatched ONE
    # frame per call (1.82 Msamples), so 81% of its recorded time was the
    # ~3 ms tunnel-relay floor and the official record tracked relay weather,
    # not the framework (487/506/517 across rounds with no code cause —
    # VERDICT r4 weak #2). K=32 moves ~56 Msamples/call, amortizing the
    # floor below 25% of the recorded time; the dispatch_floor stage records
    # the measured fraction alongside.
    from audio_modem_tpu.parallel.multi_receiver import (
        _batch_window_decode_multi,
        _classify_round,
    )

    K = 32
    est_len = framing.estimate_frame_samples(chunk_size + 11, mode)
    cadence = est_len + p.silence_pre_chunk(False) + p.silence_post_chunk()
    margin = 4 * sym + p.fft_size + 2048  # _multi_params margin (2*half = fft)
    w_turbo = -(-(K * cadence + margin) // 128) * 128
    log(f"building {n_streams}x{K}-frame turbo windows (w={w_turbo})")
    pls_turbo = np.frombuffer(
        b"".join(
            framing.build_data_chunk_payload(rng.bytes(chunk_size), s % K)
            for s in range(n_streams * K)
        ),
        np.uint8,
    ).reshape(n_streams * K, -1)
    frames_turbo = framing._synth_frames_core(
        jnp.asarray(pls_turbo), mode, n_payload_sym,
        p.silence_pre_chunk(False), p.silence_post_chunk(),
    ).reshape(n_streams, K * cadence)
    win_turbo = jax.block_until_ready(
        jnp.pad(frames_turbo, ((0, 0), (0, w_turbo - K * cadence)))
    )
    minp = jax.device_put(jnp.zeros(n_streams, jnp.int32))
    nv_turbo = jax.device_put(jnp.full(n_streams, K * cadence, jnp.int32))
    log("compiling K-frame turbo round")
    packed = jax.block_until_ready(
        _batch_window_decode_multi(
            win_turbo, minp, nv_turbo, mode, n_payload_sym, K, cadence
        )
    )
    cls = _classify_round(np.asarray(packed), chunk_size)
    assert cls is not None, "turbo packed rows too narrow"
    det_t, _, full_t, seq_t = cls
    assert bool(det_t.all()), "turbo round: not all slots detected"
    assert bool(full_t.all()), "turbo round: not all slots CRC-valid"
    assert bool((seq_t == np.arange(K)[None, :]).all()), "turbo seq mismatch"

    log("timing K-frame turbo rounds")
    dt_full = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out_t = _batch_window_decode_multi(
                win_turbo, minp, nv_turbo, mode, n_payload_sym, K, cadence
            )
        jax.block_until_ready(out_t)
        dt_full = min(dt_full, time.perf_counter() - t0)
    # samples consumed per dispatch = K frame cadences per stream (the same
    # accounting the runtime's pred_dispatch stage uses)
    total_samples = K * cadence * n_streams * iters
    msps_full = total_samples / dt_full / 1e6
    details["headline_frames_per_dispatch"] = K
    details["headline_samples_per_dispatch"] = K * cadence * n_streams
    details["headline_percall_ms"] = round(dt_full / iters * 1e3, 3)
    details["frames_per_sec"] = round(n_streams * K * iters / dt_full, 1)
    log(f"headline: {msps_full:.1f} Msps")

    def emit() -> None:
        realtime_x = msps_full * 1e6 / 44100.0
        details["realtime_streams_per_chip"] = round(realtime_x, 0)
        if skipped:
            details["skipped_stages"] = skipped
        headline = {
            "metric": "streaming demod Msamples/s/chip (64-stream QPSK, 32-frame turbo rounds, full pipeline)",
            "value": round(msps_full, 2),
            "unit": "Msamples/s",
            "vs_baseline": round(msps_full / 44.1, 3),
        }
        # Full details go to a FILE, and the headline is the FINAL stdout
        # line kept COMPACT: the driver captures only a bounded tail of
        # stdout, and round 3's inline details dict outgrew it — the
        # official BENCH_r03.json recorded "parsed: null" with the headline
        # truncated mid-JSON (VERDICT r3 weak #1).
        details_path = os.environ.get("AMT_BENCH_DETAILS", "docs/bench_r5_local.json")
        try:
            with open(details_path, "w") as f:
                json.dump({**headline, "details": details}, f, indent=2)
            log(f"details written to {details_path}")
        except OSError as e:
            log(f"could not write details file: {e}")
        print(json.dumps(headline), flush=True)

    def stage(name: str, min_left_s: float):
        """Budget gate: run the stage if time remains, else record a skip."""

        def deco(fn):
            if left() < min_left_s:
                log(f"SKIP {name} (budget: {left():.0f}s left)")
                skipped.append(name)
                return
            log(f"stage {name} (budget: {left():.0f}s left)")
            try:
                fn()
            except Exception as e:  # a failed detail must not kill the headline
                log(f"stage {name} FAILED: {e}")
                skipped.append(name)

        return deco

    # ---- 512-stream scale point (amortizes tunnel dispatch, shows the
    # device's real ceiling) ----
    @stage("batch512", 150.0)
    def _():
        sig512 = jax.device_put(jnp.tile(jnp.asarray(signals), (8, 1)))
        nv512 = jax.device_put(jnp.tile(jnp.asarray(n_valid), (8,)))
        full512 = jax.jit(lambda s, nv: batch_decode_signals(s, nv, mode, max_syms))
        jax.block_until_ready(full512(sig512, nv512))
        dt = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out512 = full512(sig512, nv512)
            jax.block_until_ready(out512)
            dt = min(dt, time.perf_counter() - t0)
        msps_512 = sig512.size * iters / dt / 1e6
        details["batch512_full_pipeline_msps"] = round(msps_512, 2)
        details["batch512_realtime_streams"] = round(msps_512 * 1e6 / 44100.0, 0)

    # ---- 4096-stream ceiling (device-bound; dispatch overhead amortized
    # to noise — the serving-scale throughput figure) ----
    @stage("batch4096", 220.0)
    def _():
        sig4k = jax.device_put(jnp.tile(jnp.asarray(signals), (64, 1)))
        nv4k = jax.device_put(jnp.tile(jnp.asarray(n_valid), (64,)))
        full4k = jax.jit(lambda s, nv: batch_decode_signals(s, nv, mode, max_syms))
        jax.block_until_ready(full4k(sig4k, nv4k))
        dt = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out4k = full4k(sig4k, nv4k)
            jax.block_until_ready(out4k)
            dt = min(dt, time.perf_counter() - t0)
        msps_4k = sig4k.size * iters / dt / 1e6
        details["batch4096_full_pipeline_msps"] = round(msps_4k, 2)
        details["batch4096_realtime_streams"] = round(msps_4k * 1e6 / 44100.0, 0)

    # ---- dispatch-floor measurement + headline analysis ----
    # The r1-r4 single-frame headline was 81% tunnel-relay floor; the K=32
    # turbo headline amortizes it. Measure the floor directly with a trivial
    # jitted op at the same pipeline depth and record what fraction of the
    # recorded per-call time it is — the official record should state what
    # the framework does, not what the relay did that day (VERDICT r4 #2).
    @stage("dispatch_floor", 60.0)
    def _():
        tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32))
        f = jax.jit(lambda x: x + 1.0)
        jax.block_until_ready(f(tiny))
        _ = np.asarray(f(tiny))
        dt = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            o = tiny
            for _ in range(iters):
                o = f(o)
            jax.block_until_ready(o)
            dt = min(dt, time.perf_counter() - t0)
        floor_ms = dt / iters * 1e3
        details["dispatch_floor_ms"] = round(floor_ms, 3)
        # local-dispatch proxy: ENQUEUE cost of an already-compiled call
        # (host-side work only — what a non-tunneled runtime would pay per
        # dispatch; the relay's round trip is what inflates the floor above)
        t0 = time.perf_counter()
        outs = [f(tiny) for _ in range(100)]
        enq_ms = (time.perf_counter() - t0) / 100 * 1e3
        jax.block_until_ready(outs)
        details["local_dispatch_proxy_ms"] = round(enq_ms, 4)
        block_samples = K * cadence * n_streams
        percall_ms = details.get("headline_percall_ms", dt_full / iters * 1e3)
        details["headline_dispatch_bound_msps"] = round(block_samples / (floor_ms * 1e-3) / 1e6, 1)
        details["headline_floor_fraction"] = round(floor_ms / percall_ms, 3)
        details["headline_analysis"] = (
            f"K={K} turbo headline: one pipelined jit call costs ~{floor_ms:.2f} ms "
            "through the axon tunnel relay regardless of work; at "
            f"{block_samples} samples/dispatch that floor bounds "
            f"{block_samples / (floor_ms * 1e-3) / 1e6:.0f} Msps and is "
            f"{100 * floor_ms / percall_ms:.0f}% of the recorded "
            f"{percall_ms:.2f} ms/call — the headline now tracks the device, "
            "not relay weather (the r1-r4 single-frame definition was 81% "
            "floor; it is kept as headline_1frame_msps for cross-round "
            "comparability). The device-bound ceiling is the batch4096 stage; "
            "a local (non-tunneled) runtime dispatches in O(10us) and would "
            "sit at it."
        )

    # ---- roofline / MFU accounting (VERDICT r3: position the ceiling
    # against the hardware, not just the 1000x target) ----
    @stage("roofline", 5.0)
    def _():
        msps = details.get("batch4096_full_pipeline_msps") or details.get(
            "batch512_full_pipeline_msps"
        )
        if not msps:
            return
        kind = jax.devices()[0].device_kind.lower()
        # bf16 MXU peak (FLOP/s), HBM bandwidth (B/s) per chip
        peaks = {
            "v5 lite": (197e12, 819e9), "v5e": (197e12, 819e9),
            "v5p": (459e12, 2765e9), "v4": (275e12, 1228e9),
            "v6": (918e12, 1640e9), "trillium": (918e12, 1640e9),
        }
        mxu_peak, hbm_peak = next(
            (v for k, v in peaks.items() if k in kind), (197e12, 819e9)
        )
        # VPU f32 peak ~= MXU/64: 8x128 FMA lanes vs 4 128x128 MXUs per core
        vpu_peak = mxu_peak / 64
        T = int(n_valid.sum()) / n_streams  # samples per stream block
        fft, half, n_act = p.fft_size, p.fft_size // 2, p.num_active_subs
        n_sym_tot = 3 + n_payload_sym  # CE + 2 preamble-adjacent + payload
        # Fused kernel (decode_fused): ONE HBM pass over the f32 signal;
        # outputs are packed bits + per-stream scalars (negligible).
        bytes_per_stream = 4.0 * T + max_syms * mode.bits_per_symbol / 8
        # VPU work: preprocess (abs/clip/scale ~4 ops) + scan products (2 mul)
        # + two exact windowed sums via doubling (2*log2(half)=16 shifted
        # adds) + ratio/threshold (~5) per sample
        vpu_flops_per_stream = (4 + 2 + 2 * np.log2(half).round() + 5) * T
        # MXU work (x3: dot_bf16x3 emulates f32 with three bf16 dots):
        # demod DFT contraction [1,fft]x[fft,2*n_act] per symbol, plus the
        # xcorr refine over ~6*cp lags x half window (block-Toeplitz)
        mxu_flops_per_stream = 3 * (
            n_sym_tot * 2 * fft * 2 * n_act + 2 * (6 * p.cp_len) * half
        )
        # achieved = per-sample work x AGGREGATE sample rate (msps is the
        # whole-batch figure; all streams process concurrently)
        gbs = (bytes_per_stream / T) * msps * 1e6 / 1e9
        mxu_tf = (mxu_flops_per_stream / T) * msps * 1e6 / 1e12
        vpu_tf = (vpu_flops_per_stream / T) * msps * 1e6 / 1e12
        pct_hbm = 100 * gbs * 1e9 / hbm_peak
        pct_mxu = 100 * mxu_tf * 1e12 / mxu_peak
        pct_vpu = 100 * vpu_tf * 1e12 / vpu_peak
        bound = max(
            (pct_hbm, "HBM bandwidth"), (pct_mxu, "MXU"), (pct_vpu, "VPU (scan)")
        )
        details["roofline"] = {
            "device_kind": kind,
            "assumed_peaks": {"mxu_bf16_tflops": mxu_peak / 1e12,
                              "hbm_gbps": hbm_peak / 1e9,
                              "vpu_f32_tflops": round(vpu_peak / 1e12, 2)},
            "bytes_per_sample": round(bytes_per_stream / T, 2),
            "vpu_flops_per_sample": round(vpu_flops_per_stream / T, 1),
            "mxu_flops_per_sample": round(mxu_flops_per_stream / T, 1),
            "achieved_gbps": round(gbs, 1),
            "achieved_mxu_tflops": round(mxu_tf, 2),
            "achieved_vpu_tflops": round(vpu_tf, 2),
            "pct_of_hbm": round(pct_hbm, 1),
            "pct_of_mxu": round(pct_mxu, 1),
            "pct_of_vpu": round(pct_vpu, 1),
            "bound_argument": (
                f"At {msps} Msps the fused one-pass decode moves "
                f"{bytes_per_stream / T:.1f} B/sample = {gbs:.0f} GB/s "
                f"({pct_hbm:.0f}% of HBM), runs {mxu_flops_per_stream / T:.0f} "
                f"MXU flops/sample = {mxu_tf:.1f} TF ({pct_mxu:.0f}% of MXU "
                f"bf16 peak) and {vpu_flops_per_stream / T:.0f} VPU "
                f"flops/sample = {vpu_tf:.1f} TF ({pct_vpu:.0f}% of VPU f32 "
                f"peak). The binding resource is {bound[1]} at "
                f"{bound[0]:.1f}% utilization, so the hardware speed-of-light "
                f"for this arithmetic is ~{100 / max(bound[0], 1e-3):.0f}x the "
                "current rate — but that bound is not reachable: the demod is "
                "not a dense matmul (per-sample work is ~4 B and ~2k flops, "
                "thousands of times below the MXU:HBM balance point), the "
                "scan walks the window serially per grid step, and tail/"
                "header symbols underfill the MXU tiles. The practical "
                "ceiling is the measured long-frame kernel rate, where the "
                "same per-sample math with no per-frame scan overhead tops "
                "out (see long_frame_kernel_msps)."
            ),
        }
        log(f"roofline: {details['roofline']['bound_argument']}")

    # ---- detect-only p50 latency (one stream window) ----
    # Pipelined per-call time at depth 10: a single blocking call through the
    # axon tunnel pays a ~28 ms relay round-trip that a local runtime would
    # not; pipelining amortizes it and reflects the device-side cost.
    @stage("detect_latency", 90.0)
    def _():
        from audio_modem_tpu import sync

        one = jax.jit(lambda s, nv: sync.detect_preamble(s, p, nv))
        s1, nv1 = sig_dev[0], nv_dev[0]
        jax.block_until_ready(one(s1, nv1))
        lats = []
        for _ in range(5):
            t0 = time.perf_counter()
            outs = [one(s1, nv1) for _ in range(10)]
            jax.block_until_ready(outs)
            lats.append((time.perf_counter() - t0) / 10)
        p50 = float(np.median(lats) * 1e3)
        details["p50_detect_latency_ms"] = round(p50, 3)
        # Device-side p50: the tunneled figure is floor-dominated (r4: floor
        # 3.008 of 3.485 ms = 86%), so it can only ever see relay-RTT
        # regressions, never detection-path ones. Subtract the measured
        # relay floor and add back the local enqueue cost — the per-call
        # latency a non-tunneled runtime would observe (VERDICT r4 #3).
        floor = details.get("dispatch_floor_ms")
        if floor is not None:
            dev_ms = max(p50 - floor + details.get("local_dispatch_proxy_ms", 0.0), 0.0)
            details["p50_detect_latency_device_ms"] = round(dev_ms, 3)
            details["detect_latency_note"] = (
                f"tunneled p50 {p50:.3f} ms includes the {floor:.3f} ms relay "
                "floor; p50_detect_latency_device_ms is the floor-adjusted "
                "device-side estimate (use it to track detection-path "
                "regressions)."
            )

    # ---- frame-aligned demod only (post-sync path) ----
    @stage("frame_demod", 120.0)
    def _():
        aligned = np.stack(
            [f[p.silence_pre_chunk(False) :][: (3 + n_payload_sym) * sym] for f in frames]
        )
        aligned_dev = jax.device_put(jnp.asarray(aligned))
        demod = jax.jit(lambda f: batch_decode_chunk_frames(f, mode, n_payload_sym))
        jax.block_until_ready(demod(aligned_dev))
        t0 = time.perf_counter()
        for _ in range(iters):
            bits = demod(aligned_dev)
        jax.block_until_ready(bits)
        details["frame_demod_only_msps"] = round(
            aligned.size * iters / (time.perf_counter() - t0) / 1e6, 2
        )

    # ---- encode-side throughput (fused TX contraction, modulate only) ----
    @stage("encode", 120.0)
    def _():
        from audio_modem_tpu import phy
        from audio_modem_tpu.framing import payload_to_bits, build_data_chunk_payload

        bits_one = payload_to_bits(build_data_chunk_payload(rng.bytes(chunk_size), 0), mode)
        bits_batch = jax.device_put(jnp.asarray(np.tile(bits_one, (n_streams, 1))))
        enc = jax.jit(lambda b: phy.modulate(b, mode))
        jax.block_until_ready(enc(bits_batch))
        _ = np.asarray(enc(bits_batch)[0, :8])  # first D2H before timing
        dt = 1e9
        for _ in range(5):  # best-of: tunnel RTT jitter dominates at this size
            t0 = time.perf_counter()
            for _ in range(iters):
                enc_out = enc(bits_batch)
            jax.block_until_ready(enc_out)
            dt = min(dt, time.perf_counter() - t0)
        details["encode_modulate_msps"] = round(
            n_streams * n_payload_sym * sym * iters / dt / 1e6, 2
        )

    # ---- FULL frame synthesis (bytes -> frames, the TX peer of the RX
    # pipeline: unpack + repetition + map + fused contraction + header
    # assembly + per-frame norm, one device program; framing._synth_frames_core)
    # at 64 / 512 / 4096 frames per launch ----
    def _encode_frames(nb: int, reps: int, depth: int):
        from audio_modem_tpu.framing import _synth_frames_core, build_data_chunk_payload

        pls = [build_data_chunk_payload(rng.bytes(chunk_size), s) for s in range(nb)]
        u8 = jax.device_put(
            jnp.asarray(np.frombuffer(b"".join(pls), np.uint8).reshape(nb, -1))
        )
        pre = p.silence_pre_chunk(False)
        post = p.silence_post_chunk()
        enc = jax.jit(lambda u: _synth_frames_core(u, mode, n_payload_sym, pre, post))
        out = jax.block_until_ready(enc(u8))
        _ = np.asarray(out[0, :8])  # first D2H before timing (tunnel warmup)
        total = out.shape[0] * out.shape[1]
        dt = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(depth):
                out = enc(u8)
            jax.block_until_ready(out)
            dt = min(dt, time.perf_counter() - t0)
        return round(total * depth / dt / 1e6, 2)

    @stage("encode_frames64", 150.0)
    def _():
        details["encode_frame_synth_msps"] = _encode_frames(64, 5, iters)

    @stage("encode_frames512", 150.0)
    def _():
        details["encode_frames512_msps"] = _encode_frames(512, 3, iters)

    @stage("encode_frames4096", 200.0)
    def _():
        # depth 4: each launch holds a [4096, ~28k] f32 output (~0.5 GB).
        # Single group since map_bits went closed-form (the table gather's
        # lowering was the old B=4096 OOM). If the remote-compile helper
        # fails (seen as HTTP 500 on fresh shapes), record 2048 under its
        # own key so the scale point is never silently absent.
        try:
            details["encode_frames4096_msps"] = _encode_frames(4096, 3, 4)
        except Exception as e:
            log(f"encode_frames4096 failed ({e}); falling back to 2048")
            details["encode_frames2048_msps"] = _encode_frames(2048, 3, 4)

    # ---- long-frame (past the VMEM gate) kernel-vs-XLA A/B ----
    # ~460k-sample narrowband chunk frames through the gridded streaming
    # demod kernel vs the XLA pipeline, same process, best-of-reps.
    # Batch 64 (device-tiled from an 8-frame upload): at batch 8 one call is
    # only ~3.7 Msamples, so both variants sit on the ~2-3 ms tunnel
    # dispatch floor and the A/B measures the relay, not the device.
    @stage("long_frame", 280.0)
    def _():
        from audio_modem_tpu.kernels.receive import decode_chunks_fused_stream
        from audio_modem_tpu.parallel.batch import (
            _batch_decode_chunk_frames_xla,
            batch_decode_chunk_frames,
        )

        narrow = MODES["BPSK-NARROW"]
        np_prof = narrow.profile
        nsym_l = framing.num_symbols_for_payload(512 + 11, narrow)
        one = framing.build_data_chunk_frame(rng.bytes(512), 0, narrow)
        one = one[np_prof.silence_pre_chunk(False) :][: (3 + nsym_l) * np_prof.symbol_len]
        lframes = np.tile(one, (8, 1))
        lframes += 0.02 * rng.standard_normal(lframes.shape).astype(np.float32)
        ldev = jax.block_until_ready(jnp.tile(jax.device_put(jnp.asarray(lframes)), (8, 1)))
        lsize = ldev.size
        # product-path entry (kernel-vs-XLA dispatch happens at trace time);
        # jit hoisted OUT of the timed lambda — a fresh jax.jit wrapper per
        # call would retrace every iteration and measure tracing, not decode
        prod = jax.jit(lambda f: batch_decode_chunk_frames(f, narrow, nsym_l))
        for key, fn in (
            ("long_frame_kernel_msps", lambda: decode_chunks_fused_stream(ldev, narrow, nsym_l)),
            ("long_frame_xla_msps", lambda: _batch_decode_chunk_frames_xla(ldev, narrow, nsym_l)),
            ("long_frame_dispatch_msps", lambda: prod(ldev)),
        ):
            jax.block_until_ready(fn())
            _ = np.asarray(fn()[:2, :8])  # slice on device: only 2x8 crosses the tunnel
            dt = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    o = fn()
                jax.block_until_ready(o)
                dt = min(dt, time.perf_counter() - t0)
            details[key] = round(lsize * iters / dt / 1e6, 2)

        # per-stage roofline (VERDICT r3: bytes + FLOPs for scan/refine/
        # demod against the hardware peaks, not just the aggregate). The
        # long-frame kernel is the demod stage in isolation (no per-frame
        # scan), so its measured rate positions that stage; scan/refine are
        # positioned at the full-pipeline rate from the main roofline block.
        rl = details.get("roofline")
        if rl:
            nfft, nact, nsym_len = np_prof.fft_size, np_prof.num_active_subs, np_prof.symbol_len
            k_msps = details["long_frame_kernel_msps"]
            demod_mxu_fs = 3 * 2 * nfft * 2 * nact / nsym_len  # dot_bf16x3 DFT per symbol
            demod_bytes = 4.0 + narrow.bits_per_symbol / 8 / nsym_len
            mxu_peak = rl["assumed_peaks"]["mxu_bf16_tflops"] * 1e12
            hbm_peak = rl["assumed_peaks"]["hbm_gbps"] * 1e9
            vpu_peak = rl["assumed_peaks"]["vpu_f32_tflops"] * 1e12
            full_msps = details.get("batch4096_full_pipeline_msps", 0)
            rl["per_stage"] = {
                "scan (strided autocorr, VPU)": {
                    "at_msps": full_msps,
                    "bytes_per_sample": 4.0,
                    "vpu_flops_per_sample": rl["vpu_flops_per_sample"],
                    "pct_of_vpu": round(
                        100 * rl["vpu_flops_per_sample"] * full_msps * 1e6 / vpu_peak, 1
                    ),
                    "pct_of_hbm": round(100 * 4.0 * full_msps * 1e6 / hbm_peak, 1),
                },
                "refine (block-Toeplitz xcorr, MXU)": {
                    "mxu_flops_per_frame": 3 * 2 * (6 * p.cp_len) * (p.fft_size // 2),
                    "note": "once per detected frame; amortized over the "
                    f"~{framing.estimate_frame_samples(chunk_size + 11, mode)}-sample "
                    "cadence it is <0.1% of either peak",
                },
                "demod (streaming DFT kernel, MXU)": {
                    "at_msps": k_msps,
                    "bytes_per_sample": round(demod_bytes, 2),
                    "mxu_flops_per_sample": round(demod_mxu_fs, 1),
                    "pct_of_mxu": round(100 * demod_mxu_fs * k_msps * 1e6 / mxu_peak, 1),
                    "pct_of_hbm": round(100 * demod_bytes * k_msps * 1e6 / hbm_peak, 1),
                },
            }

    # ---- STANDARD-profile long frame (lane-misaligned sym=576) A/B ----
    # VERDICT r3 item 4: the flat kernel now covers sym=576 via an XLA
    # body-extraction prologue; measure it against plain XLA on a >330k
    # sample QPSK frame (32 KB payload) so the routing is evidence-based.
    @stage("long_frame_standard", 200.0)
    def _():
        from audio_modem_tpu.kernels.receive import decode_chunks_fused_stream
        from audio_modem_tpu.parallel.batch import (
            _batch_decode_chunk_frames_xla,
            batch_decode_chunk_frames,
        )

        nsym_s = framing.num_symbols_for_payload(32768 + 11, mode)
        one = framing.build_data_chunk_frame(rng.bytes(32768), 0, mode)
        one = one[p.silence_pre_chunk(False) :][: (3 + nsym_s) * sym]
        sframes = np.tile(one, (8, 1))
        sframes += 0.02 * rng.standard_normal(sframes.shape).astype(np.float32)
        sdev = jax.block_until_ready(jnp.tile(jax.device_put(jnp.asarray(sframes)), (8, 1)))
        ssize = sdev.size
        sprod = jax.jit(lambda f: batch_decode_chunk_frames(f, mode, nsym_s))
        for key, fn in (
            ("long_std_kernel_msps", lambda: decode_chunks_fused_stream(sdev, mode, nsym_s)),
            ("long_std_xla_msps", lambda: _batch_decode_chunk_frames_xla(sdev, mode, nsym_s)),
            # product routing must match the measured winner (XLA for the
            # lane-misaligned standard profile; see parallel/batch.py)
            ("long_std_dispatch_msps", lambda: sprod(sdev)),
        ):
            jax.block_until_ready(fn())
            _ = np.asarray(fn()[:2, :8])
            dt = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    o = fn()
                jax.block_until_ready(o)
                dt = min(dt, time.perf_counter() - t0)
            details[key] = round(ssize * iters / dt / 1e6, 2)

    # ---- WHOLE streaming runtime at scale: 64 live streams through
    # BatchReceiver (host FSM + batched scan/refine/demod dispatches),
    # BASELINE config 5's sustained form ----
    @stage("batch_receiver", 250.0)
    def _():
        from audio_modem_tpu import api
        from audio_modem_tpu.parallel.multi_receiver import BatchReceiver

        n, block = 64, 65536
        # host-fed variants are INGEST-bound through the axon tunnel
        # (~10-30 MB/s, run-dependent; see the measured h2d_bandwidth_mbps
        # detail) — 4 chunks/stream measures the same bound 4x cheaper than
        # the r3 run's 16 (which spent ~21 min here and starved later stages)
        data = rng.bytes(chunk_size * 4)
        sig = np.concatenate(list(api.encode_chunked(data, mode, "b.bin", batch=4)))
        blocks_list = []
        for off in range(0, len(sig), block):
            buf = np.zeros((n, block), np.float32)
            seg = sig[off : off + block]
            buf[:, : len(seg)] = seg[None, :]
            blocks_list.append(buf)

        # warm + 1 timed rep is representative (the tunnel is the bound)
        for label, kw in (
            ("batch_receiver_msps", {}),
            ("batch_receiver_turbo_msps", {"window_decode": True}),
        ):
            def feed_h(rx):
                for b in blocks_list:
                    rx.process_blocks(b)
                rx.flush()

            warm = BatchReceiver(mode, n, scan_bucket=block, **kw)
            feed_h(warm)  # compiles every stage executable
            assert warm.results()[0]["complete"], f"batch_receiver bench decode failed ({label})"
            rx = BatchReceiver(mode, n, scan_bucket=block, **kw)
            t0 = time.perf_counter()
            feed_h(rx)
            details[label] = round(n * len(sig) / (time.perf_counter() - t0) / 1e6, 2)

        # device-resident ingest at STEADY STATE: 128 chunks/stream so the
        # scan-free cadence-predicted rounds (and the speculative fetch
        # pipeline riding them) dominate — a short transfer is mostly
        # startup scans + tail. Blocks are built ON DEVICE as broadcast
        # slices of the uploaded signal — no tunnel bandwidth in the loop;
        # the local-runtime proxy.
        data2 = rng.bytes(chunk_size * 128)
        sig2 = np.concatenate(list(api.encode_chunked(data2, mode, "b2.bin", batch=16)))
        n_blocks = -(-len(sig2) // block)
        sig2_dev = jax.device_put(
            jnp.asarray(np.pad(sig2, (0, n_blocks * block - len(sig2))))
        )
        slice_block = jax.jit(
            lambda s, o: jnp.broadcast_to(
                jax.lax.dynamic_slice(s, (o,), (block,))[None, :], (n, block)
            )
        )
        dev_blocks = [slice_block(sig2_dev, jnp.int32(i * block)) for i in range(n_blocks)]
        jax.block_until_ready(dev_blocks)

        def feed_dev(rx):
            for b in dev_blocks:
                rx.process_blocks(b)
            rx.flush()

        warm = BatchReceiver(mode, n, scan_bucket=block, device_ingest=True)
        feed_dev(warm)
        res0 = warm.results()[0]
        assert res0["complete"] and res0["data"] == data2, "batch_receiver bench decode failed (device)"
        dt = 1e9
        for _ in range(3):
            rx = BatchReceiver(mode, n, scan_bucket=block, device_ingest=True)
            t0 = time.perf_counter()
            feed_dev(rx)
            dt_rep = time.perf_counter() - t0
            dt = min(dt, dt_rep)
        details["batch_receiver_device_msps"] = round(n * len(sig2) / dt / 1e6, 2)
        details["batch_receiver_realtime_streams"] = round(
            details["batch_receiver_device_msps"] * 1e6 / 44100.0, 0
        )
        rep = rx.timer.report()
        details["batch_receiver_stage_breakdown"] = rep
        # Non-fetch throughput: the runtime with the blocking result D2H
        # subtracted (fetch stages move the DECODED PAYLOAD through the
        # axon tunnel at ~10-30 MB/s; on local PCIe/DMA at >10 GB/s the
        # same bytes cost ~nothing). Uses the LAST rep's wall to match the
        # breakdown it subtracts from. UPPER BOUND: pipelined rounds issue
        # copy_to_host_async, so part of the fetch wall already overlaps
        # device compute — subtracting all of it is optimistic (advisor r4).
        fetch_s = sum(v["seconds"] for k2, v in rep.items() if k2.endswith("_fetch"))
        details["batch_receiver_nonfetch_msps"] = round(
            n * len(sig2) / max(dt_rep - fetch_s, 1e-9) / 1e6, 2
        )
        details["batch_receiver_nonfetch_note"] = (
            "upper bound for a non-tunneled deployment: subtracts the full "
            "blocking-fetch wall, part of which was already overlapped by "
            "copy_to_host_async during pipelined rounds"
        )
        # tunnel ingest bandwidth: the hard cap on any HOST-fed runtime here
        up = jax.device_put(jnp.asarray(blocks_list[0]))  # warm path
        t0 = time.perf_counter()
        for b in blocks_list:
            up = jax.device_put(jnp.asarray(b))
        jax.block_until_ready(up)
        bw = sum(b.size for b in blocks_list) * 4 / (time.perf_counter() - t0) / 1e6
        details["h2d_bandwidth_mbps"] = round(bw, 1)
        # tunnel D2H bandwidth: the hard cap on fetching decoded payload.
        # Two sizes subtract the fixed ~28 ms round-trip from the estimate.
        # Every rep converts a FRESH device array: jax.Array caches the host
        # copy after the first np.asarray, so re-converting the same array
        # times a host-memory read (measured "2.4 TB/s" before this fix).
        def t_d2h(n: int) -> float:
            best = 1e9
            for i in range(3):
                arr = jax.block_until_ready(jnp.full(n, i, jnp.uint8))
                t0 = time.perf_counter()
                _ = np.asarray(arr)
                best = min(best, time.perf_counter() - t0)
            return best

        _ = np.asarray(jax.block_until_ready(jnp.zeros(1 << 10, jnp.uint8)))  # warm
        small_n, big_n = 1 << 18, 1 << 22  # 256 KB, 4 MB
        d2h = (big_n - small_n) / max(t_d2h(big_n) - t_d2h(small_n), 1e-9) / 1e6
        details["d2h_bandwidth_mbps"] = round(d2h, 1)
        # decoded-payload bytes fetched per sample covered: each round slot
        # returns 5 + wire-payload packed uint8 per cadence worth of samples
        frame_samp = framing.estimate_frame_samples(chunk_size + 11, mode)
        slot_bytes = chunk_size + 11 + 5
        d2h_bound = d2h * 1e6 * frame_samp / slot_bytes / 1e6
        details["batch_receiver_d2h_bound_msps"] = round(d2h_bound, 1)
        details["batch_receiver_analysis"] = (
            "host-fed variants are INGEST-bound: every sample crosses the axon "
            f"tunnel at ~{bw:.0f} MB/s (= {bw / 4:.0f} Msamples/s hard cap), and the "
            "staged path re-uploads scan windows on top. The device_ingest variant "
            "keeps the ring in HBM — but its result fetches move the decoded "
            f"payload back through the same tunnel at ~{d2h:.0f} MB/s D2H "
            f"(~{slot_bytes} packed B per {frame_samp}-sample frame), bounding the "
            f"tunneled runtime at ~{d2h_bound:.0f} Msps regardless of device speed. "
            "batch_receiver_nonfetch_msps subtracts exactly that fetch cost and is "
            "the honest proxy for a non-tunneled deployment, where the same bytes "
            "ride PCIe/DMA at >10 GB/s (<1% overhead)."
        )


    # ---- per-mode full-pipeline Msps (all profiles x constellations) ----
    # Catches regressions in acoustic/narrowband matmul shapes (CP 128/256)
    # and the 16/64-QAM demap cost that the QPSK headline can't see. Each
    # mode is its own budget-gated stage (a cold compile costs minutes).
    # Batch 512 (8 uploaded frames device-tiled x64): at batch 64 one call
    # is floor-dominated through the tunnel (~2.3 ms/call caps ~815 Msps),
    # so the matrix couldn't see device-side regressions (VERDICT r3 weak
    # 5). BPSK-REPEAT's payload is sized so its x3-repetition frame matches
    # BPSK-ACOUSTIC's sample count — the delta IS the repetition epilogue.
    per_mode: dict = {}
    for mode_name in (
        "QPSK", "16-QAM", "64-QAM", "BPSK-ACOUSTIC", "BPSK-NARROW", "BPSK-REPEAT"
    ):

        @stage(f"mode:{mode_name}", 200.0)
        def _(mode_name=mode_name):
            m = MODES[mode_name]
            msym = m.profile.symbol_len
            # narrowband at x3 repetition: 512 B is a ~500k-sample frame,
            # past the fused kernel's VMEM gate; 128 B (~170k samples, like
            # acoustic at 512 B) keeps the stage on the kernel path and the
            # cold compile bounded
            payload = (
                128 if mode_name == "BPSK-NARROW"
                else 512 // m.repetition if "BPSK" in mode_name
                else m.chunk_size
            )
            mframes = list(
                framing.build_data_chunk_frames([rng.bytes(payload) for _ in range(8)], 0, m)
            ) * 8
            msignals, mnv = pad_signals(mframes)
            mmax_syms = max((msignals.shape[1] - 3 * msym) // msym, 1)
            ms_dev = jnp.tile(jax.device_put(jnp.asarray(msignals)), (8, 1))
            mnv_dev = jnp.tile(jax.device_put(jnp.asarray(mnv)), (8,))
            mfull = jax.jit(lambda s, nv, m=m, k=mmax_syms: batch_decode_signals(s, nv, m, k))
            mout = jax.block_until_ready(mfull(ms_dev, mnv_dev)["detected"])
            assert bool(np.asarray(mout).all()), f"{mode_name} bench decode failed detection"
            dt = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(iters):
                    mo = mfull(ms_dev, mnv_dev)
                jax.block_until_ready(mo["bits"])
                dt = min(dt, time.perf_counter() - t0)
            per_mode[mode_name] = round(8 * int(mnv.sum()) * iters / dt / 1e6, 1)

    if per_mode:
        details["per_mode_msps"] = per_mode
    emit()
    log("done")


if __name__ == "__main__":
    main()
