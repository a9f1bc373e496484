"""Fused Schmidl-Cox detection as a Pallas TPU kernel.

The XLA formulation (sync.detect_preamble) materializes ~8 signal-length
intermediates in HBM (products, two windowed sums, metric, running max,
masks). This kernel keeps one stream's whole window in VMEM (a 16 K..32 K
sample bucket is 64..128 KB — far under the ~16 MB/core budget), computes

    P[d]  = sum_{m<256} x[d+m] x[d+m+256]          (lag-256 correlation)
    Ra[d] = sum x[d..d+256)^2,  Rb[d] = sum x[d+256..d+512)^2
    metric = P^2 / (Ra Rb)   on energetic, in-range positions
    first-peak commit: stop at the first d where the metric fell below
    0.7x its running max after clearing the 0.5 threshold (app.js:829-839)

entirely on-chip, and writes two scalars per stream. Windowed sums use the
same doubling decomposition as sync.windowed_sum (exact pairwise trees);
the running max is a Hillis-Steele prefix-max (log2 T shifted maxes).

Grid: one program per stream. Outputs: (idx int32 [B], best f32 [B]);
idx = -1 when best <= threshold, matching the XLA path bit-for-bit in
decision semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_modem_tpu.sync import AUTOCORR_THRESHOLD, windowed_sum

_HALF = 256  # fft_size // 2 for every profile (modem.js:287)


def _prefix_max(m: jnp.ndarray) -> jnp.ndarray:
    """Running max along the last axis via Hillis-Steele doubling."""
    n = m.shape[-1]
    s = 1
    while s < n:
        shifted = jnp.pad(m[..., : n - s], ((0, 0), (s, 0)))
        m = jnp.maximum(m, shifted)
        s <<= 1
    return m


_ROWS = 8  # streams per program (min sublane tile for f32)


def _detect_kernel(nv_ref, minpos_ref, me_ref, sig_ref, idx_ref, best_ref):
    x = sig_ref[...]  # [_ROWS, T]
    t = x.shape[-1]
    n_pos = t - 2 * _HALF + 1
    nv = nv_ref[...]  # [_ROWS, 1]
    min_pos = minpos_ref[...]
    min_energy = me_ref[...]

    prod = x[:, : t - _HALF] * x[:, _HALF:]
    p = windowed_sum(prod, _HALF)[:, :n_pos]
    e = windowed_sum(x * x, _HALF)
    ra = e[:, :n_pos]
    rb = e[:, _HALF : _HALF + n_pos]

    d = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, n_pos), 1)
    valid = (d <= nv - 2 * _HALF) & (d >= min_pos) & (ra > min_energy) & (rb > min_energy)
    metric = jnp.where(valid, (p * p) / jnp.where(valid, ra * rb, 1.0), 0.0)

    runmax = _prefix_max(metric)
    drop = (runmax > AUTOCORR_THRESHOLD) & (metric < 0.7 * runmax)
    first_drop = jnp.min(jnp.where(drop, d, n_pos - 1), axis=-1, keepdims=True)
    prefix = jnp.where(d <= first_drop, metric, 0.0)
    best = jnp.max(prefix, axis=-1, keepdims=True)
    idx = jnp.min(jnp.where(prefix == best, d, n_pos), axis=-1)  # first argmax
    idx_ref[...] = jnp.where(best[:, 0] > AUTOCORR_THRESHOLD, idx, -1).astype(jnp.int32).reshape(_ROWS, 1)
    best_ref[...] = best


@partial(jax.jit, static_argnames=("interpret",))
def detect_preamble_pallas(
    signals: jnp.ndarray,
    n_valid: jnp.ndarray,
    min_pos: jnp.ndarray,
    min_energy: jnp.ndarray,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched fused detection: [B, T] f32 -> (idx [B] i32, best [B] f32).

    ``n_valid``/``min_pos``/``min_energy`` are per-stream ([B]).
    """
    b, t = signals.shape
    if b % _ROWS:
        pad = _ROWS - b % _ROWS
        signals = jnp.pad(signals, ((0, pad), (0, 0)))
        n_valid = jnp.pad(jnp.asarray(n_valid, jnp.int32), (0, pad))
        min_pos = jnp.pad(jnp.asarray(min_pos, jnp.int32), (0, pad))
        min_energy = jnp.pad(jnp.asarray(min_energy, jnp.float32), (0, pad))
        idx, best = detect_preamble_pallas(signals, n_valid, min_pos, min_energy, interpret)
        return idx[:b], best[:b]
    grid = (b // _ROWS,)
    kernel = pl.pallas_call(
        _detect_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ),
        interpret=interpret,
    )
    idx2, best2 = kernel(
        jnp.asarray(n_valid, jnp.int32).reshape(b, 1),
        jnp.asarray(min_pos, jnp.int32).reshape(b, 1),
        jnp.asarray(min_energy, jnp.float32).reshape(b, 1),
        signals.astype(jnp.float32),
    )
    return idx2[:, 0], best2[:, 0]
