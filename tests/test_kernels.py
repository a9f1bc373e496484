"""Pallas kernel correctness vs the XLA reference formulation (interpret
mode on CPU; the real lowering is exercised on TPU by bench.py)."""

import jax.numpy as jnp
import numpy as np

from audio_modem_tpu import framing, sync
from audio_modem_tpu.configs import MODES
from audio_modem_tpu.kernels.detect import detect_preamble_pallas


def _compare(signals: np.ndarray, n_valid: np.ndarray, profile):
    sp = sync.preprocess(jnp.asarray(signals), jnp.asarray(n_valid))
    idx_x, best_x = sync.detect_preamble(sp, profile, jnp.asarray(n_valid))
    b = signals.shape[0]
    idx_p, best_p = detect_preamble_pallas(
        sp,
        jnp.asarray(n_valid),
        jnp.zeros(b, jnp.int32),
        jnp.full(b, sync.AUTOCORR_MIN_ENERGY, jnp.float32),
        interpret=True,
    )
    ix, ip = np.asarray(idx_x), np.asarray(idx_p)
    # Same detection decision everywhere.
    assert np.array_equal(ix < 0, ip < 0)
    # On detections, indices may differ by float-noise tie-breaks on the
    # preamble's metric plateau (CP-long, metric ~1.0 throughout); any point
    # within the 3*CP xcorr refinement radius yields the identical final
    # sync. On TPU the compiled kernel is idx-exact vs the XLA path.
    det = ix >= 0
    assert np.abs(ix[det] - ip[det]).max(initial=0) <= 3 * profile.cp_len
    assert np.abs(np.asarray(best_x) - np.asarray(best_p)).max() < 1e-5


def test_detect_kernel_on_noise():
    rng = np.random.default_rng(0)
    signals = rng.standard_normal((8, 4096)).astype(np.float32) * 0.05
    n_valid = np.full(8, 4096, np.int32)
    _compare(signals, n_valid, MODES["QPSK"].profile)


def test_detect_kernel_on_real_frames():
    mode = MODES["BPSK-ACOUSTIC"]
    rng = np.random.default_rng(1)
    frames = [framing.build_data_chunk_frame(rng.bytes(32), s, mode) for s in range(4)]
    t = max(len(f) for f in frames)
    signals = np.zeros((4, t), np.float32)
    for i, f in enumerate(frames):
        signals[i, : len(f)] = f
    n_valid = np.asarray([len(f) for f in frames], np.int32)
    _compare(signals, n_valid, mode.profile)


def test_detect_kernel_batch_padding():
    """Non-multiple-of-8 batches pad internally and slice back."""
    rng = np.random.default_rng(2)
    signals = rng.standard_normal((3, 2048)).astype(np.float32) * 0.05
    n_valid = np.full(3, 2048, np.int32)
    sp = sync.preprocess(jnp.asarray(signals), jnp.asarray(n_valid))
    idx, best = detect_preamble_pallas(
        sp, jnp.asarray(n_valid), jnp.zeros(3, jnp.int32),
        jnp.full(3, 0.01, jnp.float32), interpret=True,
    )
    assert idx.shape == (3,) and best.shape == (3,)


class TestFusedReceive:
    """Full-fusion decode kernel (kernels/receive.py) vs the XLA pipeline:
    decision-identical starts, detection flags, and payload bits for every
    mode, under noise. Interpret mode here; bench.py + the axon smoke test
    exercise the compiled Mosaic lowering on hardware."""

    def _signals(self, mode, n=3, payload=None, noise=0.02, seed=7):
        from audio_modem_tpu.parallel.batch import pad_signals

        rng = np.random.default_rng(seed)
        size = payload if payload is not None else min(mode.chunk_size, 512)
        frames = [framing.build_data_chunk_frame(rng.bytes(size), s, mode) for s in range(n)]
        frames = [f + noise * rng.standard_normal(len(f)).astype(np.float32) for f in frames]
        sym = mode.profile.symbol_len
        signals, n_valid = pad_signals(frames, pad_len=len(frames[0]) + 2 * sym)
        max_syms = max((signals.shape[1] - 3 * sym) // sym, 1)
        return jnp.asarray(signals), jnp.asarray(n_valid), max_syms

    def test_decode_fused_matches_xla_all_modes(self):
        from audio_modem_tpu.kernels.receive import decode_fused
        from audio_modem_tpu.parallel.batch import _batch_decode_signals_xla

        for name in ["QPSK", "16-QAM", "BPSK-ACOUSTIC", "BPSK-NARROW", "64-QAM"]:
            mode = MODES[name]
            signals, n_valid, max_syms = self._signals(mode)
            ref = _batch_decode_signals_xla(signals, n_valid, mode, max_syms)
            out = decode_fused(
                signals, n_valid, jnp.zeros(signals.shape[0], jnp.int32),
                mode, max_syms, interpret=True,
            )
            assert np.asarray(out["detected"]).all(), name
            for key in ("start", "detected", "bits"):
                assert np.array_equal(np.asarray(ref[key]), np.asarray(out[key])), (name, key)
            assert np.abs(np.asarray(ref["fine_metric"]) - np.asarray(out["fine_metric"])).max() < 1e-5

    def test_decode_fused_channel_estimate(self):
        """ch_re/ch_im reassembled from the kernel's sectioned CE output
        match the XLA estimate on active bins."""
        from audio_modem_tpu import phy
        from audio_modem_tpu.kernels.receive import decode_fused

        import jax

        mode = MODES["QPSK"]
        p = mode.profile
        signals, n_valid, max_syms = self._signals(mode, n=2)
        out = decode_fused(
            signals, n_valid, jnp.zeros(2, jnp.int32), mode, max_syms, interpret=True
        )
        sp = sync.preprocess(signals, n_valid)
        sym = p.symbol_len
        for i in range(2):
            start = int(out["start"][i])
            ce = jax.lax.dynamic_slice(sp[i], (start + 2 * sym,), (sym,))
            r_re, r_im = phy.estimate_channel(ce, p)
            assert np.abs(np.asarray(r_re) - np.asarray(out["ch_re"][i])).max() < 1e-4
            assert np.abs(np.asarray(r_im) - np.asarray(out["ch_im"][i])).max() < 1e-4

    def test_decode_fused_no_preamble(self):
        """Pure noise: detected must be False, matching XLA."""
        from audio_modem_tpu.kernels.receive import decode_fused

        mode = MODES["QPSK"]
        rng = np.random.default_rng(3)
        signals = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32) * 0.05)
        n_valid = jnp.asarray([8192, 4000], dtype=jnp.int32)
        out = decode_fused(signals, n_valid, jnp.zeros(2, jnp.int32), mode, 4, interpret=True)
        assert not np.asarray(out["detected"]).any()

    def test_decode_chunks_fused_matches_xla_all_modes(self):
        from audio_modem_tpu.kernels.receive import decode_chunks_fused
        from audio_modem_tpu.parallel.batch import _batch_decode_chunk_frames_xla

        rng = np.random.default_rng(11)
        for name in ["QPSK", "16-QAM", "BPSK-ACOUSTIC", "BPSK-NARROW", "64-QAM"]:
            mode = MODES[name]
            p = mode.profile
            sym = p.symbol_len
            size = 256 if "BPSK" in name else mode.chunk_size
            n_sym = framing.num_symbols_for_payload(size + 11, mode)
            fr = []
            for s in range(5):
                f = framing.build_data_chunk_frame(rng.bytes(size), s, mode)
                f = f[p.silence_pre_chunk(False):][: (3 + n_sym) * sym]
                fr.append(f + 0.02 * rng.standard_normal(len(f)).astype(np.float32))
            frames = jnp.asarray(np.stack(fr))
            ref = np.asarray(_batch_decode_chunk_frames_xla(frames, mode, n_sym))
            out = np.asarray(decode_chunks_fused(frames, mode, n_sym, interpret=True))
            assert np.array_equal(ref, out), name

    def test_vmem_gate_routes_long_frames_to_xla(self, monkeypatch):
        """fused_receive_fits rejects frames whose VMEM footprint would blow
        the Mosaic compile (observed: ~500k-sample narrowband frames), and
        the dispatchers then fall back to the XLA path even with kernels
        forced on — so a legacy 32 KB frame (~7.3M samples) can never reach
        pallas_call."""
        from audio_modem_tpu.kernels.receive import fused_chunks_fits, fused_receive_fits
        from audio_modem_tpu.parallel import batch

        qpsk = MODES["QPSK"]
        narrow = MODES["BPSK-NARROW"]
        # bench/streaming shapes fit
        assert fused_receive_fits(28544, qpsk, 46)
        assert fused_receive_fits(180_000, MODES["BPSK-ACOUSTIC"], 208)
        # 512 B narrowband (~500k samples / ~590 syms) and the legacy 32 KB
        # frame (~7.3M samples) must not
        assert not fused_receive_fits(500_000, narrow, 590)
        assert not fused_receive_fits(7_300_000, narrow, 9300)
        assert fused_chunks_fits(30_000, qpsk, 46)
        assert not fused_chunks_fits(7_300_000, narrow, 9300)

        # dispatch falls back to XLA (this would crash on CPU if the
        # non-interpret pallas path were taken with kernels forced on)
        monkeypatch.setenv("AMT_KERNELS", "1")
        signals, n_valid, max_syms = self._signals(narrow, n=2, payload=64)
        long = jnp.pad(signals, ((0, 0), (0, 600_000 - signals.shape[1])))
        out = batch.batch_decode_signals(long, n_valid, narrow, max_syms)
        assert np.asarray(out["detected"]).all()

    def test_bit_packing_roundtrip(self):
        """The 16-bit pack matrices invert exactly through the unpack
        epilogue for every constellation geometry."""
        from audio_modem_tpu.kernels.receive import _geometry, _pack_matrix

        for name in ["QPSK", "16-QAM", "BPSK-ACOUSTIC", "BPSK-NARROW", "64-QAM"]:
            mode = MODES[name]
            g = _geometry(mode.profile)
            nd, nd_pad, bps = g["nd"], g["nd_pad"], mode.bps
            pm = _pack_matrix(mode)
            rng = np.random.default_rng(5)
            bits = rng.integers(0, 2, (4, nd, bps))
            words = np.zeros((4, 128), np.float32)
            for b in range(bps):
                plane = np.zeros((4, nd_pad), np.float32)
                plane[:, :nd] = bits[:, :, b]
                words += plane @ pm[b * nd_pad : (b + 1) * nd_pad]
            n_words = -(-(nd * bps) // 16)
            w = words[:, :n_words].astype(np.int64)
            shifts = np.arange(15, -1, -1)
            unpacked = ((w[..., None] >> shifts) & 1).reshape(4, n_words * 16)[:, : nd * bps]
            assert np.array_equal(unpacked, bits.reshape(4, nd * bps))


class TestFusedFrontend:
    def test_matches_xla_pipeline(self):
        import jax
        import jax.numpy as jnp

        from audio_modem_tpu import framing, sync
        from audio_modem_tpu.configs import MODES
        from audio_modem_tpu.kernels.frontend import frontend_fused
        from audio_modem_tpu.parallel.batch import pad_signals

        mode = MODES["QPSK"]
        p = mode.profile
        rng = np.random.default_rng(41)
        frames = [framing.build_data_chunk_frame(rng.bytes(200), s, mode) for s in range(8)]
        signals, n_valid = pad_signals(
            frames, pad_len=max(len(f) for f in frames) + 8 * p.cp_len + 2 * p.symbol_len
        )
        zeros = jnp.zeros(signals.shape[0], jnp.int32)
        sp = sync.preprocess(jnp.asarray(signals), jnp.asarray(n_valid))
        cx, _ = sync.detect_preamble(sp, p, jnp.asarray(n_valid), stride=16)
        sx, mx = jax.vmap(lambda s, c, n: sync.refine_xcorr(s, jnp.maximum(c, 0), p, n))(
            sp, cx, jnp.asarray(n_valid)
        )
        st, fm, co, pre = frontend_fused(
            jnp.asarray(signals), jnp.asarray(n_valid), zeros, p, interpret=True
        )
        assert np.array_equal(np.asarray(sx), np.asarray(st))  # refined starts identical
        assert np.abs(np.asarray(mx) - np.asarray(fm)).max() < 1e-5
        assert np.abs(np.asarray(pre) - np.asarray(sp)).max() < 1e-6
        # coarse may differ only within the metric plateau (<= CP)
        assert np.abs(np.asarray(cx) - np.asarray(co)).max() <= p.cp_len
