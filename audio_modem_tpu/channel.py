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


def clock_drift(signal: jnp.ndarray, ppm: float) -> jnp.ndarray:
    """Resample by (1 + ppm*1e-6) with linear interpolation — models the
    TX/RX sample-clock mismatch of two real sound cards."""
    if ppm == 0.0:
        return signal
    t = signal.shape[-1]
    src = jnp.arange(t, dtype=jnp.float32) * (1.0 + ppm * 1e-6)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, t - 1)
    i1 = jnp.clip(i0 + 1, 0, t - 1)
    frac = src - i0.astype(jnp.float32)
    return signal[..., i0] * (1.0 - frac) + signal[..., i1] * frac


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
