"""Channel simulator: the framework's fault-injection and test harness.

The reference has no channel models (SURVEY §5 'fault injection: none'); its
only 'channel' is real air/cable. For an automated test story we model the
acoustic channel explicitly: AWGN, multipath FIR echoes, gain, DC offset,
sample-clock drift (resampling), and dropout. All models are pure JAX and
batched, so BER-vs-SNR sweeps run as one vmapped computation on device.

Config-driven (ChannelSpec) so tests/benchmarks declare channels precisely;
required by BASELINE configs 2 (AWGN) and 4 (multipath).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ChannelSpec:
    """Declarative channel description, applied in physical order:
    gain/multipath -> clock drift -> DC offset -> dropout -> AWGN."""

    snr_db: float | None = None  # AWGN SNR relative to signal power
    multipath: tuple[tuple[int, float], ...] = ()  # (delay_samples, amplitude) echoes
    gain: float = 1.0
    dc_offset: float = 0.0
    clock_ppm: float = 0.0  # sample-clock offset in parts-per-million
    dropout: tuple[tuple[int, int], ...] = ()  # (start, length) zeroed spans


def awgn(signal: jnp.ndarray, snr_db: float, key: jax.Array) -> jnp.ndarray:
    """Add white Gaussian noise at ``snr_db`` relative to mean signal power."""
    power = jnp.mean(signal.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    noise_power = power / (10.0 ** (snr_db / 10.0))
    noise = jax.random.normal(key, signal.shape, jnp.float32)
    return signal + noise * jnp.sqrt(noise_power)


def multipath(signal: jnp.ndarray, taps: tuple[tuple[int, float], ...]) -> jnp.ndarray:
    """Direct path + delayed attenuated echoes (sparse FIR)."""
    x = signal.astype(jnp.float32)
    out = x
    idx = jnp.arange(signal.shape[-1])
    for delay, amp in taps:
        echo = jnp.roll(x, delay, axis=-1)
        # zero the wrapped head so the echo is causal
        echo = jnp.where(idx >= delay, echo, 0.0)
        out = out + amp * echo
    return out


def clock_drift(signal: jnp.ndarray, ppm: float, taps: int = 65) -> jnp.ndarray:
    """Resample by (1 + ppm*1e-6) with a Kaiser-windowed-sinc interpolator —
    models the TX/RX sample-clock mismatch of two real sound cards.

    A real clock offset is a pure time shift of a bandlimited waveform; the
    physical 'interpolator' (the receiving ADC sampling the analog wave) is
    ideal. Linear interpolation — the usual simulator shortcut — is NOT: at
    the half-sample point its response is |cos(pi f)|, i.e. ~0.15 at the
    standard profile's ~20 kHz top subcarrier (bin 232/512), so the
    simulator itself would destroy band-edge bins and no receiver could
    pass a drift test in the wide-band modes. A 65-tap Kaiser(beta=8) sinc
    kernel keeps the polyphase responses near-flat through the band while
    preserving the pure-delay model. Output length equals input length;
    computed in 64k-sample blocks so peak memory stays O(block * taps)."""
    if ppm == 0.0:
        return signal
    from jax.scipy.special import i0 as bessel_i0

    x = signal.astype(jnp.float32)
    t = x.shape[-1]
    half = taps // 2
    offs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    beta = 8.0
    block = 65536
    n_blocks = -(-t // block)
    dst = jnp.arange(n_blocks * block, dtype=jnp.float32).reshape(n_blocks, block)

    def one(dst_blk):
        src = dst_blk * (1.0 + ppm * 1e-6)
        base = jnp.floor(src)
        mu = src - base
        idx = jnp.clip(
            base.astype(jnp.int32)[:, None] + offs.astype(jnp.int32)[None, :], 0, t - 1
        )
        u = offs[None, :] - mu[:, None]
        r = u / (half + 1)
        win = bessel_i0(beta * jnp.sqrt(jnp.clip(1.0 - r * r, 0.0, 1.0))) / bessel_i0(beta)
        k = jnp.sinc(u) * win
        k = k / k.sum(-1, keepdims=True)
        return (x[..., idx] * k).sum(-1)  # [..., block]

    out = jax.lax.map(one, dst)  # [n_blocks, ..., block]
    out = jnp.moveaxis(out, 0, -2).reshape(*x.shape[:-1], n_blocks * block)
    return out[..., :t]


def dropout(signal: jnp.ndarray, spans: tuple[tuple[int, int], ...]) -> jnp.ndarray:
    """Zero out sample spans (models buffer underruns / interference bursts)."""
    idx = jnp.arange(signal.shape[-1])
    out = signal
    for start, length in spans:
        out = jnp.where((idx >= start) & (idx < start + length), 0.0, out)
    return out


def apply_channel(signal: jnp.ndarray, spec: ChannelSpec, key: jax.Array | None = None) -> jnp.ndarray:
    """Apply a ChannelSpec. ``key`` required iff spec.snr_db is set."""
    out = signal.astype(jnp.float32) * spec.gain
    if spec.multipath:
        out = multipath(out, spec.multipath)
    if spec.clock_ppm:
        out = clock_drift(out, spec.clock_ppm)
    if spec.dc_offset:
        out = out + spec.dc_offset
    if spec.dropout:
        out = dropout(out, spec.dropout)
    if spec.snr_db is not None:
        if key is None:
            raise ValueError("AWGN requires a PRNG key")
        out = awgn(out, spec.snr_db, key)
    return out


def apply_channel_np(signal: np.ndarray, spec: ChannelSpec, seed: int = 0) -> np.ndarray:
    """Host convenience wrapper returning numpy float32."""
    key = jax.random.PRNGKey(seed) if spec.snr_db is not None else None
    return np.asarray(apply_channel(jnp.asarray(signal), spec, key), dtype=np.float32)
