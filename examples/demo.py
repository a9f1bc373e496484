"""End-to-end demo: file -> modem WAV -> noisy acoustic channel -> streaming
receive -> verification + diagnostic plots.

    python examples/demo.py [--mode 16-QAM] [--fec] [--snr 18]

Produces demo_out/: the TX WAV, the channel-degraded RX WAV, the recovered
file, and spectrum/channel/BER plots.
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="QPSK")
    ap.add_argument("--fec", action="store_true")
    ap.add_argument("--snr", type=float, default=20.0)
    ap.add_argument("--size", type=int, default=6000, help="payload bytes")
    args = ap.parse_args()

    from audio_modem_tpu import api, channel, diag, framing
    from audio_modem_tpu.configs import get_mode
    from audio_modem_tpu.utils import plots
    from audio_modem_tpu.utils.wav import read_wav, write_wav

    out = pathlib.Path("demo_out")
    out.mkdir(exist_ok=True)
    mode = get_mode(args.mode)
    rng = np.random.default_rng(0)
    payload = rng.bytes(args.size)
    (out / "original.bin").write_bytes(payload)

    # --- transmit ---
    frames = api.encode(payload, mode, "demo.bin", fec=args.fec)
    tx = np.concatenate(frames)
    write_wav(str(out / "tx.wav"), tx)
    print(f"TX: {len(payload)} B -> {len(frames)} frame(s), {len(tx)/44100:.2f}s of audio")

    # --- acoustic channel ---
    spec = channel.ChannelSpec(
        snr_db=args.snr, multipath=((17, 0.2), (43, 0.08)), gain=0.6, dc_offset=0.004
    )
    rx = channel.apply_channel_np(tx, spec, seed=1)
    write_wav(str(out / "rx.wav"), rx)
    print(f"channel: AWGN {args.snr} dB + 2-tap multipath + gain 0.6 + DC")

    # --- receive ---
    signal, _ = read_wav(str(out / "rx.wav"))
    if len(frames) == 1:
        result, info = api.decode(signal, mode)
        ok = not isinstance(result, framing.FrameError) and result.crc_valid
        data = b"" if isinstance(result, framing.FrameError) else result.data
        if info and info.channel_mag is not None:
            plots.plot_channel_response(info.channel_mag, mode.profile, str(out / "channel.png"))
        extra = f", FEC corrected {result.fec_corrected} B" if ok and result.fec_corrected else ""
        print(f"RX (legacy): crc={'OK' if ok else 'FAIL'}{extra}")
    else:
        res = api.decode_chunked(signal, mode, fec=args.fec)
        ok = not isinstance(res, framing.FrameError) and res.complete
        data = b"" if isinstance(res, framing.FrameError) else res.data
        print(f"RX (chunked): {getattr(res, 'received_chunks', 0)}/{getattr(res, 'total_chunks', 0)} chunks")

    (out / "received.bin").write_bytes(data)
    print("payload match:", data == payload)

    # --- diagnostics ---
    rep = diag.analyze_input(signal)
    plots.plot_spectrum(rep.spectrum_db, rep.freqs, str(out / "spectrum.png"), mode.profile)
    plots.plot_waveform(signal[: 44100 * 2], str(out / "waveform.png"))
    curve = diag.ber_vs_snr(mode, snrs_db=(0.0, 5.0, 10.0, 15.0, 20.0, 25.0), n_streams=8, n_sym=4)
    plots.plot_ber_curve(curve, str(out / "ber.png"), f"BER vs SNR — {mode.name}")
    print("plots in", out)


if __name__ == "__main__":
    main()
