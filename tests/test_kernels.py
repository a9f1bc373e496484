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
