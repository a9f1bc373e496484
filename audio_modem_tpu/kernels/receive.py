"""Full-fusion receive pipeline as one Pallas TPU kernel: bits in, bits out.

Fuses EVERYTHING the decode path does per stream — preprocess (DC removal +
peak norm), strided Schmidl-Cox detection with first-peak commit, fine xcorr
refinement (block-Toeplitz template-bank matmul), channel estimation, one-tap
ZF EQ, pilot common-phase correction, hard demap, and bit packing — into a
single VMEM-resident pass per 8-stream tile. The signal is read from HBM
once; what comes back is five scalars per stream, the channel estimate, and
the payload bits packed 16-per-float32-word (~25x smaller than the input).
This removes the preprocessed-batch HBM writeback that bounded the round-1
partial-fusion front-end kernel at XLA parity AND the whole XLA CE/demod
stage after it.

Reference hot loops subsumed (see docstrings in sync.py / phy.py for the
semantics): detectPreamble modem.js:286-319, fine xcorr modem.js:567-588,
estimateChannel modem.js:421-440, demodulateOFDM modem.js:365-418,
preprocessSignal modem.js:213-232.

TPU mapping notes (hard-won Mosaic constraints, extending round 1's list):

* Dynamic vector loads must be 128-lane aligned. The refined frame start is
  arbitrary, so the frame is re-aligned with TWO aligned loads (offset lo and
  lo+128) and a pair of one-hot shift matmuls built in-kernel from
  broadcasted_iota vs the traced remainder r = start - lo: selection
  matrices are exact {0,1}, so at HIGHEST precision the MXU reproduces the
  samples bit-for-bit.
* 3*symbol_len + cp_len = 3*fft + 4*cp is a 128-multiple for every profile
  (cp in {64,128,256}), and the symbol stride is 128-aligned per symbol
  (acoustic 640, narrowband 768) or per symbol PAIR (standard 576*2=1152) —
  so the demod loop is a fori_loop over aligned dynamic slices of the
  re-aligned frame, not a 50-way unroll.
* The per-symbol DFT + channel apply is one [8, 512] @ [512, SECT] matmul
  with 128-aligned column sections [d_re | d_im | p_re | p_im]; the CE
  known BPSK signs apply as a row-vector multiply on the same matrix's
  output (a second folded DFT matrix cost 1.5 MB of VMEM).
* Bits leave the kernel packed 16 per float32 word (exact: <= 65535) via
  constant pack matmuls, one per bit position of the constellation.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_modem_tpu.configs import ModemMode, OfdmProfile
from audio_modem_tpu.ops.constellations import CONSTELLATIONS
from audio_modem_tpu.ops.dft import _rx_matrix_for_bins, dot_bf16x3
from audio_modem_tpu.sync import (
    AUTOCORR_MIN_ENERGY,
    AUTOCORR_THRESHOLD,
    COARSE_STRIDE,
    XCORR_MIN_DENOM,
    _template,
    _template_bank,
    windowed_sum,
)

_ROWS = 8
_HALF = 256
_LANE = 128
_HI = jax.lax.Precision.HIGHEST
_SCAN_CHUNK = COARSE_STRIDE * _LANE  # 2048 scan positions per matmul row


def _dot_exact3(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """f32-exact selection matmul in three 1-pass bf16 MXU products.

    Requires every element of ``m`` to be exactly bf16-representable ({0,1}
    one-hot / window masks here). x splits exactly into three bf16 parts
    (8+8+8 >= 24 mantissa bits): each pass selects/sums one part with f32
    accumulation, and the final sum reconstructs the full-precision result.
    For one-nonzero-per-column selection matrices this is BIT-EXACT (no
    accumulation at all); for window masks it is f32-accurate with only
    benign ordering differences. Half the passes of Precision.HIGHEST."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = x - hi
    mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r1 - mid
    d = partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(hi, m) + d(mid, m) + d(lo, m)


def _rx_t_pad(t: int, l_al: int) -> int:
    """Preprocessed-scratch length: covers the re-align loads
    (t + l_al + 128) AND the scan's chunk-padded slices (l2 + 2 chunks)."""
    l2 = _round_up(_round_up(t, _LANE), _SCAN_CHUNK)
    return max(_round_up(t, _LANE) + l_al + _LANE, l2 + 2 * _SCAN_CHUNK)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=None)
def _geometry(profile: OfdmProfile) -> dict:
    """Static per-profile layout constants for the kernel."""
    nd = int(profile.num_data_subs)
    npi = len(profile.pilots)
    nd_pad = _round_up(nd, _LANE)
    np_pad = _round_up(npi, _LANE)
    sym = profile.symbol_len
    spi = 1 if sym % _LANE == 0 else 2  # symbols per demod iteration
    assert (spi * sym) % _LANE == 0
    assert (3 * sym + profile.cp_len) % _LANE == 0
    return dict(nd=nd, npi=npi, nd_pad=nd_pad, np_pad=np_pad, spi=spi)


@lru_cache(maxsize=None)
def _rx_sections_pair(profile: OfdmProfile) -> np.ndarray:
    """[2*sym, 2*SECT] block-diagonal pair DFT: a lane-aligned 2-symbol
    super-slot (standard profile: 2*576 = 1152 = 9 lanes) multiplies ONCE
    against this matrix and yields BOTH symbols' sectioned spectra side by
    side — rows 0:fft map symbol A's CP-stripped body to columns 0:SECT,
    rows sym:sym+fft map symbol B's to columns SECT:2*SECT; CP rows are
    zero. Trades ~2.25x extra MXU MACs (a ~7%-utilized resource, see the
    bench roofline) for eliminating BOTH the XLA body-extraction prologue's
    [B, n_slots*fft] HBM materialization (~8 B/sample extra traffic, the
    measured reason the flat kernel lost ~5% to XLA on standard long
    frames — VERDICT r4 item 5) and any in-kernel misaligned slice."""
    rx = _rx_sections(profile)
    fft = profile.fft_size
    sym = profile.symbol_len
    sect = rx.shape[1]
    out = np.zeros((2 * sym, 2 * sect), np.float32)
    out[:fft, :sect] = rx
    out[sym : sym + fft, sect:] = rx
    return out


@lru_cache(maxsize=None)
def _rx_sections(profile: OfdmProfile) -> np.ndarray:
    """[fft, 2*nd_pad + 2*np_pad] DFT matrix with 128-aligned column
    sections [d_re | d_im | p_re | p_im]; pad columns are zero."""
    g = _geometry(profile)
    data_bins = tuple(int(b) for b in profile.data_bins)
    pilot_bins = tuple(int(b) for b in profile.pilot_bins)
    md = _rx_matrix_for_bins(profile, data_bins)  # [fft, 2*nd]
    mp = _rx_matrix_for_bins(profile, pilot_bins)  # [fft, 2*np]
    fft = profile.fft_size
    nd, npi, nd_pad, np_pad = g["nd"], g["npi"], g["nd_pad"], g["np_pad"]
    out = np.zeros((fft, 2 * nd_pad + 2 * np_pad), np.float32)
    out[:, :nd] = md[:, :nd]
    out[:, nd_pad : nd_pad + nd] = md[:, nd:]
    out[:, 2 * nd_pad : 2 * nd_pad + npi] = mp[:, :npi]
    out[:, 2 * nd_pad + np_pad : 2 * nd_pad + np_pad + npi] = mp[:, npi:]
    return out


@lru_cache(maxsize=None)
def _ce_known_row(profile: OfdmProfile) -> np.ndarray:
    """[1, 2*nd_pad + 2*np_pad] known CE BPSK signs in section layout, so
    H = (body_ce @ RX) * kn — one row-broadcast multiply instead of a second
    1.5 MB VMEM-resident DFT matrix (X = +-1 real, H = Y * X)."""
    g = _geometry(profile)
    known = profile.ce_known_signs.astype(np.float32)
    pilot_mask = profile.pilot_mask_active
    kd = known[~pilot_mask]
    kp = known[pilot_mask]
    nd, npi, nd_pad, np_pad = g["nd"], g["npi"], g["nd_pad"], g["np_pad"]
    out = np.zeros((1, 2 * nd_pad + 2 * np_pad), np.float32)
    out[0, :nd] = kd
    out[0, nd_pad : nd_pad + nd] = kd
    out[0, 2 * nd_pad : 2 * nd_pad + npi] = kp
    out[0, 2 * nd_pad + np_pad : 2 * nd_pad + np_pad + npi] = kp
    return out


@lru_cache(maxsize=None)
def _pack_matrix(mode: ModemMode) -> np.ndarray:
    """[bps * nd_pad, 128] stack of per-bit-position pack matrices.

    Global payload bit n = bin*bps + b goes to word n//16 with weight
    2^(15 - n%16) (MSB-first within each 16-bit word, matching
    ops.bits.bits_to_bytes order). Row b*nd_pad + bin covers bit b of data
    bin ``bin``; pad rows are zero. Words per symbol = ceil(nd*bps/16)
    <= 77 < 128 for every mode."""
    g = _geometry(mode.profile)
    nd, nd_pad = g["nd"], g["nd_pad"]
    bps = mode.bps
    n_words = -(-(nd * bps) // 16)
    assert n_words <= _LANE
    out = np.zeros((bps * nd_pad, _LANE), np.float32)
    for b in range(bps):
        for k in range(nd):
            n = k * bps + b
            out[b * nd_pad + k, n // 16] = float(1 << (15 - (n % 16)))
    return out


def _inverse_gray_i32(g: jnp.ndarray, nbits: int) -> jnp.ndarray:
    b = g
    shift = 1
    while shift < nbits:
        b = b ^ (b >> shift)
        shift <<= 1
    return b


def _demap_bit_planes(cr: jnp.ndarray, ci: jnp.ndarray, name: str) -> list[jnp.ndarray]:
    """Hard demap -> per-bit-position int32 planes (same closed forms as
    ops.constellations.demap, kept elementwise for the VPU). Returns
    [bps] arrays shaped like cr; plane b = bit b (MSB first) of each bin."""
    c = CONSTELLATIONS[name]
    if name == "BPSK":
        return [(cr < 0).astype(jnp.int32)]
    if name == "QPSK":
        b0 = (ci < 0).astype(jnp.int32)
        b1 = b0 ^ (cr < 0).astype(jnp.int32)
        return [b0, b1]
    bpa = c.bps // 2
    m = 1 << bpa
    top = m - 1
    pts = c.points_np()
    scale = float(pts[:, 0].max() / top)

    def axis_bits(x):
        grade = jnp.clip(jnp.round((x / scale + top) * 0.5), 0, top).astype(jnp.int32)
        return _inverse_gray_i32(grade, bpa)

    col = axis_bits(cr)
    row = axis_bits(ci)
    idx = (row << bpa) | col
    return [(idx >> (c.bps - 1 - b)) & 1 for b in range(c.bps)]


def _group_syms(sym: int, n_sym: int) -> int:
    """Symbols batched per demod matmul: up to 16 (8 streams x 16 = the full
    128-row MXU); even when sym is not a 128-multiple (standard, 576) so the
    group stride stays lane-aligned."""
    g = min(16, n_sym)
    if sym % _LANE and g % 2:
        g += 1
    return g


def _tile_rows(x: jnp.ndarray, reps: int, stream_major: bool = False) -> jnp.ndarray:
    """[8, n] -> [8*reps, n], repeating the 8-row block via an exact {0,1}
    one-hot matmul — the Mosaic-legal way to tile across sublanes (concat/pad
    at sublane offsets is rejected). Row r takes source row r % 8
    (symbol-major: row k*8+i = stream i, symbol k) or r // reps when
    ``stream_major`` (row i*reps+k = stream i, symbol k — the layout the
    flat streaming kernel's lane-aligned reshape produces)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (_ROWS * reps, _ROWS), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (_ROWS * reps, _ROWS), 1)
    src = r // reps if stream_major else r % _ROWS
    sel = (src == c).astype(jnp.float32)
    return _dot_exact3(sel, x)


def _tiled_channel(
    ch: jnp.ndarray, reps: int, nd_pad: int, np_pad: int, stream_major: bool = False
):
    """Tile the [8, SECT] channel estimate to [8*reps, *] row blocks and
    pre-divide conj(H) by |H|^2 ONCE PER FRAME, so EQ + demap + pack run
    once per G-symbol group on full [8G, n] tiles (G=16 -> 128 rows = the
    native MXU/VPU tile height) with no per-group divisions (VPU divide is
    ~10x a multiply; Y * conj(H)/|H|^2 == Y * Hn with Hn precomputed)."""
    hd_re = ch[:, :nd_pad]
    hd_im = ch[:, nd_pad : 2 * nd_pad]
    hp_re = ch[:, 2 * nd_pad : 2 * nd_pad + np_pad]
    hp_im = ch[:, 2 * nd_pad + np_pad :]
    if reps > 1:
        hd_re = _tile_rows(hd_re, reps, stream_major)
        hd_im = _tile_rows(hd_im, reps, stream_major)
        hp_re = _tile_rows(hp_re, reps, stream_major)
        hp_im = _tile_rows(hp_im, reps, stream_major)
    hd_mag = hd_re * hd_re + hd_im * hd_im
    hp_mag = hp_re * hp_re + hp_im * hp_im
    hd_ok = hd_mag > 1e-10
    hp_ok = hp_mag > 1e-10
    hd_den = jnp.where(hd_ok, hd_mag, 1.0)
    hp_den = jnp.where(hp_ok, hp_mag, 1.0)
    return (
        hd_re / hd_den, hd_im / hd_den, hd_ok,
        hp_re / hp_den, hp_im / hp_den, hp_ok,
    )


def _eq_demap_pack(
    spec, hd_re, hd_im, hd_ok, hp_re, hp_im, hp_ok,
    pack, mode: ModemMode, nd_pad: int, np_pad: int,
):
    """[R, SECT] spectra (R = 8 streams x G grouped symbols, row k*8+i =
    stream i / symbol k) -> packed words [R, 128]: one-tap ZF EQ
    (modem.js:384-394; hd/hp are conj(H)/|H|^2 from _tiled_channel), pilot
    small-angle phase (modem.js:397-405), hard demap, 16-bit pack. All math
    is rowwise, so grouping symbols just makes the tiles full-height. Pack
    matmuls run at DEFAULT precision — {0,1} planes times power-of-two
    weights are exact in a single bf16 pass."""
    dr0 = spec[:, :nd_pad]
    di0 = spec[:, nd_pad : 2 * nd_pad]
    pr0 = spec[:, 2 * nd_pad : 2 * nd_pad + np_pad]
    pi0 = spec[:, 2 * nd_pad + np_pad :]
    dr = jnp.where(hd_ok, dr0 * hd_re + di0 * hd_im, dr0)
    di = jnp.where(hd_ok, di0 * hd_re - dr0 * hd_im, di0)
    pr = jnp.where(hp_ok, pr0 * hp_re + pi0 * hp_im, pr0)
    pi = jnp.where(hp_ok, pi0 * hp_re - pr0 * hp_im, pi0)
    usable = jnp.abs(pr) > 1e-6
    ratio = jnp.where(usable, pi / jnp.where(usable, pr, 1.0), 0.0)
    cnt = usable.sum(axis=-1, keepdims=True)
    phi = jnp.where(cnt > 0, ratio.sum(axis=-1, keepdims=True) / jnp.maximum(cnt, 1), 0.0)
    cr = dr + di * phi
    ci = di - dr * phi
    planes = _demap_bit_planes(cr, ci, mode.constellation)
    words = None
    for b, plane in enumerate(planes):
        term = jnp.dot(
            plane.astype(jnp.float32),
            pack[b * nd_pad : (b + 1) * nd_pad],
            preferred_element_type=jnp.float32,
        )
        words = term if words is None else words + term
    return words


_FUSED_VMEM_BUDGET = 32 * 1024 * 1024


def fused_receive_fits(t: int, mode: ModemMode, max_syms: int) -> bool:
    """VMEM-footprint gate for decode_fused: the kernel keeps THREE
    frame-sized float32 buffers per 8-stream tile resident (raw signal
    block, preprocessed scratch, re-aligned scratch), so its footprint
    grows as ~96 bytes/sample. Beyond a few hundred k samples/frame that
    approaches the per-core VMEM ceiling and the Mosaic compile time blows
    up (observed: a 500k-sample narrowband frame compiles >20 min through
    the remote relay; a 173k acoustic frame compiles in seconds). Callers
    route frames that don't fit to decode_long_fused on TPU (XLA front-end
    + the gridded streaming demod kernel, length-unbounded) and to the XLA
    pipeline elsewhere — both decision-identical (e.g. the ~7.3M-sample
    32 KB legacy frame, BASELINE config 2)."""
    profile = mode.profile
    sym = profile.symbol_len
    g_syms = _group_syms(sym, max_syms)
    syms_padded = -(-max_syms // g_syms) * g_syms
    l_al = _round_up((3 + syms_padded) * sym + profile.cp_len, _LANE)
    t_pad = _rx_t_pad(t, l_al)
    frame_bytes = 4 * _ROWS * (t + t_pad + l_al)
    words_bytes = 4 * _ROWS * syms_padded * _LANE
    body_bytes = 4 * _ROWS * g_syms * profile.fft_size
    return frame_bytes + words_bytes + body_bytes <= _FUSED_VMEM_BUDGET


def fused_chunks_fits(t: int, mode: ModemMode, n_sym: int) -> bool:
    """Same gate for the frame-aligned chunk kernel (one frame-sized
    block + demod scratch per tile)."""
    profile = mode.profile
    g_syms = _group_syms(profile.symbol_len, n_sym)
    syms_padded = -(-n_sym // g_syms) * g_syms
    need = (3 + syms_padded) * profile.symbol_len + profile.cp_len
    t_pad = _round_up(max(t, need), _LANE)
    return (
        4 * _ROWS * (t_pad + n_sym * _LANE) + 4 * _ROWS * g_syms * profile.fft_size
        <= _FUSED_VMEM_BUDGET
    )


@lru_cache(maxsize=None)
def _scan_masks() -> tuple[np.ndarray, np.ndarray]:
    """[2048, 128] window masks for the full-lane strided scan: output
    column c of a [*, 2048] @ mask product is the 256-wide window starting
    at position 16*c within the row (M1: in-row part) plus its spill into
    the next 2048-chunk (M2: columns c >= 112)."""
    l = np.arange(_SCAN_CHUNK)[:, None]
    c = np.arange(_LANE)[None, :]
    m1 = ((l >= COARSE_STRIDE * c) & (l < COARSE_STRIDE * c + _HALF)).astype(np.float32)
    m2 = (l < COARSE_STRIDE * c + _HALF - _SCAN_CHUNK).astype(np.float32)
    return m1, m2


def _receive_kernel(
    nv_ref, minpos_ref, sig_ref, bank_ref, rx_ref, kn_ref, pack_ref, m1_ref, m2_ref,
    start_ref, fine_ref, coarse_ref, cmetric_ref, ch_ref, words_ref,
    pre_ref, al_ref, body_ref,
    *, mode: ModemMode, t_energy: float, max_syms: int, t_pad: int, l_al: int,
):
    profile = mode.profile
    g = _geometry(profile)
    sym = profile.symbol_len
    cp = profile.cp_len
    fft = profile.fft_size
    nd_pad, np_pad = g["nd_pad"], g["np_pad"]

    x = sig_ref[...]  # [8, T]
    t = x.shape[-1]
    nv = nv_ref[...]  # [8, 1] int32
    min_pos = minpos_ref[...]

    # ---- preprocess (sync.preprocess) ----
    mask = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) < nv
    s = jnp.where(mask, x, 0.0)
    mean = s.sum(axis=-1, keepdims=True) / jnp.maximum(nv.astype(jnp.float32), 1.0)
    s = jnp.where(mask, s - mean, 0.0)
    mx = jnp.abs(s).max(axis=-1, keepdims=True)
    s = s * jnp.where(mx > 1e-6, 1.0 / jnp.where(mx > 1e-6, mx, 1.0), 1.0)
    pre_ref[:, :t] = s
    pre_ref[:, t:] = jnp.zeros((_ROWS, t_pad - t), jnp.float32)

    # ---- detect: STRIDED Schmidl-Cox scan in full-lane [*, 128] layout ----
    # Window sums at d = 2048*q + 16*c come from [8*r2, 2048] @ [2048, 128]
    # mask matmuls: N = 128 output lanes, so every VPU/MXU tile runs full,
    # and the first-peak commit's running-max trees operate on [*, 128]
    # tiles (the earlier [kq, 8] form burned 16x the tiles on 8-lane
    # columns). This is the Mosaic-legal form of
    # sync._strided_windowed_sum (whose 3-D reshape Mosaic rejects);
    # positions and commit semantics match sync.detect_preamble (stride=16)
    # exactly, float ordering differs immaterially (window sums run at bf16
    # precision — see below).
    stride = COARSE_STRIDE
    chunk = _SCAN_CHUNK
    l2 = _round_up(_round_up(t, _LANE), chunk)  # whole scan chunks; <= t_pad - 2*chunk
    r2 = l2 // chunk  # scan rows per stream
    big = jnp.int32(t_pad)
    m1 = m1_ref[...]
    m2 = m2_ref[...]

    r_sc = jax.lax.broadcasted_iota(jnp.int32, (_ROWS * r2, _LANE), 0)
    q_blk = r_sc % r2  # scan row within a stream's block
    nrows = _ROWS * r2

    # Data movement is the scan's real cost, so: FOUR aligned ref loads (no
    # value slicing; x at +0 / +256 / +2048 / +2304), six elementwise
    # products, and window dots at DEFAULT (1-pass bf16) precision — the
    # metric feeds >0.5/0.7x thresholded commits where 0.4% error moves a
    # committed coarse index at most a plateau step, always inside the
    # refine radius. Each window's next-chunk spill comes from a product of
    # the +2048-offset loads (row r of the shifted series IS chunk r+1 of
    # the base series) — NOT from a sublane roll of the in-row result: a
    # whole-array wraparound roll measured fine in interpret mode but
    # returned garbage rows on hardware, injecting data-region energy into
    # the silence region and committing false sub-threshold peaks.
    x0 = pre_ref[:, pl.ds(0, l2)]  # zeros past t
    x1 = pre_ref[:, pl.ds(_HALF, l2)]
    xn0 = pre_ref[:, pl.ds(chunk, l2)]
    xn1 = pre_ref[:, pl.ds(chunk + _HALF, l2)]
    d = partial(jnp.dot, preferred_element_type=jnp.float32)

    def _win(b0, b1):
        return d(b0.reshape(nrows, chunk), m1) + d(b1.reshape(nrows, chunk), m2)

    p2_b = _win(x0 * x1, xn0 * xn1)
    ra2_b = _win(x0 * x0, xn0 * xn0)
    rb2_b = _win(x1 * x1, xn1 * xn1)
    d2d = chunk * q_blk[:r2] + stride * jax.lax.broadcasted_iota(
        jnp.int32, (r2, _LANE), 1
    )  # block-local positions (identical for every stream block)
    d2d_b = chunk * q_blk + stride * jax.lax.broadcasted_iota(
        jnp.int32, (_ROWS * r2, _LANE), 1
    )
    # per-stream nv / min_pos as [8*r2, 1] columns via an exact one-hot
    # matmul (values < 2^24, exact in f32)
    sel_b = (
        r_sc[:, :1] // r2 == jax.lax.broadcasted_iota(jnp.int32, (_ROWS * r2, _ROWS), 1)
    ).astype(jnp.float32)
    nv_b = _dot_exact3(sel_b, nv.astype(jnp.float32))
    mp_b = _dot_exact3(sel_b, min_pos.astype(jnp.float32))
    d2d_f = d2d_b.astype(jnp.float32)
    valid_b = (
        (d2d_f <= nv_b - 2 * _HALF)
        & (d2d_f >= mp_b)
        & (ra2_b > AUTOCORR_MIN_ENERGY)
        & (rb2_b > AUTOCORR_MIN_ENERGY)
    )
    metric_b = jnp.where(valid_b, (p2_b * p2_b) / jnp.where(valid_b, ra2_b * rb2_b, 1.0), 0.0)

    # first-peak commit in row-major (q, c) order per stream block: lane
    # prefix-max within rows, then a sublane doubling prefix-max of row
    # maxima MASKED to stay within each stream's r2-row block. Lane shifts
    # use pad+slice; sublane shifts use pltpu.roll + iota mask (Mosaic
    # rejects concat/pad at a sublane offset).
    rowpref_b = metric_b
    sh_l = 1
    while sh_l < _LANE:
        rowpref_b = jnp.maximum(
            rowpref_b, jnp.pad(rowpref_b[:, : _LANE - sh_l], ((0, 0), (sh_l, 0)))
        )
        sh_l <<= 1
    rowmax_b = rowpref_b[:, _LANE - 1 : _LANE]  # [8*r2, 1]
    q_col = q_blk[:, :1]

    def _shift_blk(v, sh):
        # v[r] <- v[r-sh] within each r2-row block, zeros filling the top
        # (metrics are >= 0; the mask also kills pltpu.roll's wraparound)
        rolled = pltpu.roll(v, sh, axis=0)
        return jnp.where(q_col >= sh, rolled, 0.0)

    rmpref_b = rowmax_b
    sh_q = 1
    while sh_q < r2:
        rmpref_b = jnp.maximum(rmpref_b, _shift_blk(rmpref_b, sh_q))
        sh_q <<= 1
    runmax_b = jnp.maximum(rowpref_b, _shift_blk(rmpref_b, 1))
    drop_b = (runmax_b > AUTOCORR_THRESHOLD) & (metric_b < 0.7 * runmax_b)

    # ---- per-row: strided detect + refine + re-align ----
    radius = 3 * cp
    n_off = 2 * radius + 1
    bank = bank_ref[...]  # [128, W]
    w = bank.shape[-1]
    n_off_a = (-(-n_off // _LANE) + 1) * _LANE
    nt = n_off_a // _LANE
    need = _LANE * (nt - 1) + w
    region_len = n_off_a + sym - 1
    k_al = l_al // _LANE

    lane_src = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    lane_dst = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)

    starts = []
    fines = []
    coarses = []
    cmetrics = []
    for i in range(_ROWS):
        metric = metric_b[i * r2 : (i + 1) * r2]  # static block slice
        drop = drop_b[i * r2 : (i + 1) * r2]
        fd = jnp.min(jnp.where(drop, d2d, big))
        prefix = jnp.where(d2d <= fd, metric, 0.0)
        best = jnp.max(prefix)
        dbest = jnp.min(jnp.where(prefix == best, d2d, big))
        coarse_i = jnp.where(best > AUTOCORR_THRESHOLD, dbest, -1).astype(jnp.int32)
        coarses.append(coarse_i)
        cmetrics.append(best)

        c = jnp.maximum(coarse_i, 0)
        lo = jnp.clip(c - radius, 0, None)
        lo_a = pl.multiple_of((lo // _LANE) * _LANE, _LANE)
        region = pre_ref[pl.ds(i, 1), pl.ds(lo_a, need)]  # [1, need], aligned
        blocks = region[0, : _LANE * (nt - 1 + w // _LANE)].reshape(nt - 1 + w // _LANE, _LANE)
        corr = None
        for j in range(w // _LANE):
            term = dot_bf16x3(
                blocks[j : j + nt], bank[:, j * _LANE : (j + 1) * _LANE].T
            )  # [nt, 128]
            corr = term if corr is None else corr + term
        corr = corr.reshape(1, nt * _LANE)
        s_energy = windowed_sum(region[:, :region_len] * region[:, :region_len], sym)
        denom = jnp.sqrt(s_energy * t_energy)
        d_global = lo_a + jax.lax.broadcasted_iota(jnp.int32, (1, n_off_a), 1)
        hi = jnp.minimum(nv[i, 0] - sym, c + radius)
        ok = (denom > XCORR_MIN_DENOM) & (d_global >= lo) & (d_global <= hi)
        m = jnp.where(ok, corr / jnp.where(ok, denom, 1.0), -jnp.inf)
        fbest = jnp.max(m)
        idx = jnp.min(jnp.where(m == fbest, d_global, nv[i, 0]))
        start_i = jnp.where(jnp.isfinite(fbest), idx, c).astype(jnp.int32)
        starts.append(start_i)
        fines.append(fbest)

        # re-align: aligned[l] = pre[start_i + l] for l in [0, l_al).
        # Two aligned loads + one-hot shift matmuls (exact at HIGHEST).
        lo_s = pl.multiple_of((start_i // _LANE) * _LANE, _LANE)
        r = start_i - lo_s
        a0 = pre_ref[pl.ds(i, 1), pl.ds(lo_s, l_al)][0].reshape(k_al, _LANE)
        a1 = pre_ref[pl.ds(i, 1), pl.ds(lo_s + _LANE, l_al)][0].reshape(k_al, _LANE)
        ms0 = (lane_src == lane_dst + r).astype(jnp.float32)
        ms1 = (lane_src == lane_dst + r - _LANE).astype(jnp.float32)
        shifted = _dot_exact3(a0, ms0) + _dot_exact3(a1, ms1)
        al_ref[pl.ds(i, 1), :] = shifted.reshape(1, l_al)

    start_ref[...] = jnp.stack(starts).reshape(_ROWS, 1)
    fine_ref[...] = jnp.stack(fines).reshape(_ROWS, 1)
    coarse_ref[...] = jnp.stack(coarses).reshape(_ROWS, 1)
    cmetric_ref[...] = jnp.stack(cmetrics).reshape(_ROWS, 1)

    # ---- channel estimation: H = (body_ce @ DFT) * known ----
    rx = rx_ref[...]
    body_ce = al_ref[:, 2 * sym + cp : 3 * sym]  # [8, fft]; cp+fft == sym
    ch = dot_bf16x3(body_ce, rx) * kn_ref[...]
    ch_ref[...] = ch

    # ---- demod loop: DFT + EQ + pilot phase + demap + pack ----
    # MXU/VPU utilization: one symbol is only 8 rows. Batching G symbols x
    # 8 streams through a [8G, 512] body scratch fills the hardware tiles
    # (G=16 -> 128 rows) for the DFT matmul AND the whole EQ + demap + pack
    # stage, which runs ONCE per group on tiled channel rows. Chunk base
    # 3*sym + cp = 3*fft + 4*cp and stride G*sym are 128-multiples for
    # every profile (sym % 64 == 0, G even), so the dynamic loads stay
    # lane-aligned.
    pack = pack_ref[...]
    g_syms = _group_syms(sym, max_syms)
    data_off = 3 * sym + cp
    chunk_len = g_syms * sym
    n_groups = -(-max_syms // g_syms)
    tiled = _tiled_channel(ch, g_syms, nd_pad, np_pad)

    def demod_group(g, carry):
        chunk = al_ref[:, pl.ds(data_off + g * chunk_len, chunk_len)]
        for k in range(g_syms):
            body_ref[pl.ds(k * _ROWS, _ROWS), :] = chunk[:, k * sym : k * sym + fft]
        spec_all = dot_bf16x3(body_ref[...], rx)  # [8*g_syms, SECT]
        words_all = _eq_demap_pack(spec_all, *tiled, pack, mode, nd_pad, np_pad)
        for k in range(g_syms):
            words_ref[:, pl.ds((g * g_syms + k) * _LANE, _LANE)] = words_all[
                k * _ROWS : (k + 1) * _ROWS
            ]
        return carry

    jax.lax.fori_loop(0, n_groups, demod_group, 0)


def _chunk_kernel(
    frames_ref, rx_ref, kn_ref, pack_ref, words_ref, body_ref,
    *, mode: ModemMode, max_syms: int,
):
    """Frame-aligned fused decode: per-frame peak norm + CE + demod + pack.

    Frames start at the preamble-1 sample (decodeChunkFrame semantics,
    modem.js:770-803, with the streaming receiver's per-frame peak
    normalization app.js:918-925); no detection/realignment needed — every
    window offset is static.
    """
    profile = mode.profile
    g = _geometry(profile)
    sym = profile.symbol_len
    cp = profile.cp_len
    fft = profile.fft_size
    nd_pad, np_pad = g["nd_pad"], g["np_pad"]

    # Per-frame peak norm (app.js:918-925) as a scale applied per window —
    # the frame itself stays in the ref; only group-sized chunks materialize.
    mx = jnp.abs(frames_ref[...]).max(axis=-1, keepdims=True)
    scale = jnp.where(mx > 1e-6, 1.0 / jnp.where(mx > 1e-6, mx, 1.0), 1.0)  # [8, 1]

    rx = rx_ref[...]
    body_ce = frames_ref[:, 2 * sym + cp : 3 * sym] * scale
    ch = dot_bf16x3(body_ce, rx) * kn_ref[...]

    # Demod loop: IDENTICAL structure to _receive_kernel's — a fori_loop of
    # uniform whole groups with dynamic lane-aligned loads. The caller pads
    # the frame and the words output to whole groups (junk symbols past
    # n_sym are truncated in the epilogue); a structurally-unrolled variant
    # with a partial last group measured ~8x slower per symbol on v5e
    # (Mosaic schedules the rolled loop far better).
    pack = pack_ref[...]
    g_syms = _group_syms(sym, max_syms)
    n_groups = -(-max_syms // g_syms)
    tiled = _tiled_channel(ch, g_syms, nd_pad, np_pad)
    data_off = 3 * sym + cp  # 3*fft + 4*cp: a 128-multiple for every profile
    chunk_len = g_syms * sym

    def demod_group(g, carry):
        chunk = frames_ref[:, pl.ds(data_off + g * chunk_len, chunk_len)] * scale
        for k in range(g_syms):
            body_ref[pl.ds(k * _ROWS, _ROWS), :] = chunk[:, k * sym : k * sym + fft]
        spec_all = dot_bf16x3(body_ref[...], rx)
        words_all = _eq_demap_pack(spec_all, *tiled, pack, mode, nd_pad, np_pad)
        for k in range(g_syms):
            words_ref[:, pl.ds((g * g_syms + k) * _LANE, _LANE)] = words_all[
                k * _ROWS : (k + 1) * _ROWS
            ]
        return carry

    jax.lax.fori_loop(0, n_groups, demod_group, 0)


# Symbol groups per grid step: amortizes fixed per-step cost (DMA setup,
# scratch gate, epilogue) against VMEM pressure. Swept on hardware
# (tools/sweep_stream_subgroups.py, batch-64 461k-sample narrowband): 4 is
# the measured optimum — 8159 Msps vs 7858 (2) / 7525 (8) / 7488 (16).
_STREAM_SUBGROUPS = 4


def _chunk_stream_flat_kernel(
    data_ref, ch_ref, scale_ref, rx_ref, pack_ref, out_ref, tiled_ref,
    *, mode: ModemMode, n_all: int, slot: int,
):
    """One grid step of the FLAT streaming demod kernel: the whole
    [8, n_all, slot] super-block collapses to a [8*n_all, slot] stream-major
    matrix by a layout-preserving leading-dim merge (minor dim stays the
    lane axis), the CP-stripped bodies are a contiguous [:, :fft] slice of
    it, and ONE dot_bf16x3 feeds ONE _eq_demap_pack over all n_all symbols
    x 8 streams. slot is sym when sym % 128 == 0 (acoustic 640, narrowband
    768); for lane-misaligned profiles (standard 576) the caller
    pre-extracts fft-length bodies and slot == fft.

    This removes the retired v2 kernel's 2 x g_syms strided sublane copies
    per sub-group (body gather + words scatter), which cost it ~1.5x vs
    plain XLA on long narrowband frames (BENCH r3 A/B: 785 vs 1179 Msps) —
    XLA reads strided operands directly into its fused matmul; now the
    kernel does too. Output rows stay stream-major per block; the XLA
    epilogue transposes them back (HBM reshuffle, negligible vs the demod).

    Measured (v5e, 461k-sample narrowband chunk frames): at batch 8 both
    paths sit on the ~2.3 ms tunnel dispatch floor (the gap is per-call
    fixed cost, not device time); at batch 64 the kernel wins ~1.4x over
    XLA, i.e. ~2x less device time per sample. Acoustic frames at batch 64
    are still dispatch-bound (both paths ~2.5 ms/call). Exact figures vary
    run to run with tunnel jitter — the committed long_frame_* entries in
    docs/bench_r*_local.json are the canonical A/B record."""
    profile = mode.profile
    g = _geometry(profile)
    fft = profile.fft_size
    nd_pad, np_pad = g["nd_pad"], g["np_pad"]
    sect = 2 * (nd_pad + np_pad)

    @pl.when(pl.program_id(1) == 0)
    def _build_tiled():
        hd_re, hd_im, hd_ok, hp_re, hp_im, hp_ok = _tiled_channel(
            ch_ref[...], n_all, nd_pad, np_pad, stream_major=True
        )
        tiled_ref[:, :nd_pad] = hd_re
        tiled_ref[:, nd_pad : 2 * nd_pad] = hd_im
        tiled_ref[:, 2 * nd_pad : 2 * nd_pad + np_pad] = hp_re
        tiled_ref[:, 2 * nd_pad + np_pad : sect] = hp_im
        tiled_ref[:, sect : sect + nd_pad] = hd_ok.astype(jnp.float32)
        tiled_ref[:, sect + nd_pad : sect + nd_pad + np_pad] = hp_ok.astype(jnp.float32)

    tl = tiled_ref[...]
    tiled = (
        tl[:, :nd_pad],
        tl[:, nd_pad : 2 * nd_pad],
        tl[:, sect : sect + nd_pad] > 0.5,
        tl[:, 2 * nd_pad : 2 * nd_pad + np_pad],
        tl[:, 2 * nd_pad + np_pad : sect],
        tl[:, sect + nd_pad : sect + nd_pad + np_pad] > 0.5,
    )
    smul = _tile_rows(scale_ref[...], n_all, stream_major=True)  # [8*n_all, 1]
    # slot == sym for lane-aligned profiles; slot == fft when the caller
    # pre-extracted CP-stripped bodies (lane-misaligned sym, e.g. standard)
    body = data_ref[...].reshape(_ROWS * n_all, slot)[:, :fft] * smul
    spec = dot_bf16x3(body, rx_ref[...])
    out_ref[...] = _eq_demap_pack(spec, *tiled, pack_ref[...], mode, nd_pad, np_pad)


def _chunk_stream_pair_kernel(
    data_ref, ch_ref, scale_ref, rx2_ref, pack_ref, out_ref, tiled_ref,
    *, mode: ModemMode, n_all: int, slot: int,
):
    """Grid step of the PAIR-SLOT streaming demod kernel (lane-misaligned
    symbols whose 2-symbol super-slot IS lane-aligned — standard profile
    576 -> 1152). Identical structure to _chunk_stream_flat_kernel, but each
    row holds TWO consecutive symbols and the single dot against the
    block-diagonal _rx_sections_pair matrix produces both sectioned spectra
    side by side; EQ+demap+pack runs once per half. No prologue, no
    misaligned in-kernel slices: the raw frame region streams straight from
    HBM exactly once, like the lane-aligned profiles."""
    profile = mode.profile
    g = _geometry(profile)
    nd_pad, np_pad = g["nd_pad"], g["np_pad"]
    sect = 2 * (nd_pad + np_pad)

    @pl.when(pl.program_id(1) == 0)
    def _build_tiled():
        hd_re, hd_im, hd_ok, hp_re, hp_im, hp_ok = _tiled_channel(
            ch_ref[...], n_all, nd_pad, np_pad, stream_major=True
        )
        tiled_ref[:, :nd_pad] = hd_re
        tiled_ref[:, nd_pad : 2 * nd_pad] = hd_im
        tiled_ref[:, 2 * nd_pad : 2 * nd_pad + np_pad] = hp_re
        tiled_ref[:, 2 * nd_pad + np_pad : sect] = hp_im
        tiled_ref[:, sect : sect + nd_pad] = hd_ok.astype(jnp.float32)
        tiled_ref[:, sect + nd_pad : sect + nd_pad + np_pad] = hp_ok.astype(jnp.float32)

    tl = tiled_ref[...]
    tiled = (
        tl[:, :nd_pad],
        tl[:, nd_pad : 2 * nd_pad],
        tl[:, sect : sect + nd_pad] > 0.5,
        tl[:, 2 * nd_pad : 2 * nd_pad + np_pad],
        tl[:, 2 * nd_pad + np_pad : sect],
        tl[:, sect + nd_pad : sect + nd_pad + np_pad] > 0.5,
    )
    smul = _tile_rows(scale_ref[...], n_all, stream_major=True)  # [8*n_all, 1]
    body = data_ref[...].reshape(_ROWS * n_all, slot) * smul
    spec2 = dot_bf16x3(body, rx2_ref[...])  # [R, 2*SECT]: symbol A | symbol B
    out_ref[:, :_LANE] = _eq_demap_pack(
        spec2[:, :sect], *tiled, pack_ref[...], mode, nd_pad, np_pad
    )
    out_ref[:, _LANE:] = _eq_demap_pack(
        spec2[:, sect:], *tiled, pack_ref[...], mode, nd_pad, np_pad
    )


def _stream_demod_words(
    data: jnp.ndarray,
    ch: jnp.ndarray,
    scale: jnp.ndarray,
    mode: ModemMode,
    n_sym: int,
    interpret: bool,
    force_extract: bool = False,
) -> jnp.ndarray:
    """Run the gridded streaming demod kernel.

    data: [B, >= syms_padded*sym] region starting at the first data symbol's
    CP-stripped body (frame offset 3*sym + cp); ch: [B, SECT] sectioned
    channel; scale: [B, 1] per-frame amplitude scale. Returns packed words
    [B, syms_padded * 128]."""
    profile = mode.profile
    b = data.shape[0]
    sym = profile.symbol_len
    fft = profile.fft_size
    g = _geometry(profile)
    slot = sym
    if sym % _LANE and (2 * sym) % _LANE == 0 and not force_extract:
        # lane-misaligned symbol whose PAIR is aligned (standard 576 ->
        # 1152): demod 2-symbol super-slots directly — no HBM prologue
        return _stream_demod_words_pair(data, ch, scale, mode, n_sym, interpret)
    if sym % _LANE and fft % _LANE == 0:
        # Lane-misaligned symbol slots (standard profile: 576 = 4.5 lanes):
        # ONE XLA strided slice extracts the CP-stripped fft-length bodies,
        # so the flat kernel's layout-preserving row merge applies (fft is
        # 128-aligned for every profile). Costs one [B, n_slots*fft] HBM
        # materialization (~8 B/sample of extra traffic — far under the HBM
        # roof at the kernel's measured rate) and retires the v2
        # strided-copy kernel for these profiles, which measured ~1.5x
        # SLOWER than plain XLA on the same structure (VERDICT r3 item 4).
        if data.shape[1] % sym:
            data = jnp.pad(data, ((0, 0), (0, sym - data.shape[1] % sym)))
        n_slots = data.shape[1] // sym
        data = data.reshape(b, n_slots, sym)[:, :, :fft].reshape(b, n_slots * fft)
        slot = fft
    g_syms = _group_syms(slot, n_sym)
    n_groups = -(-n_sym // g_syms)
    sub_groups = min(_STREAM_SUBGROUPS, n_groups)
    super_len = sub_groups * g_syms * slot
    n_super = -(-n_groups // sub_groups)
    need = n_super * super_len
    if data.shape[1] < need:
        data = jnp.pad(data, ((0, 0), (0, need - data.shape[1])))
    data = data[:, :need]
    rx = jnp.asarray(_rx_sections(profile))
    pack = jnp.asarray(_pack_matrix(mode))
    sect = rx.shape[1]

    if slot % _LANE == 0:
        # flat path: lane-aligned symbol slots -> one [8*n_all, fft] dot per
        # grid step, zero in-kernel copies (see _chunk_stream_flat_kernel)
        n_all = sub_groups * g_syms
        data3 = data.reshape(b, n_super * n_all, slot)
        kernel = pl.pallas_call(
            partial(_chunk_stream_flat_kernel, mode=mode, n_all=n_all, slot=slot),
            grid=(b // _ROWS, n_super),
            in_specs=[
                pl.BlockSpec((_ROWS, n_all, slot), lambda i, s: (i, s, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_ROWS, sect), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_ROWS, 1), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(rx.shape, lambda i, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(pack.shape, lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (_ROWS * n_all, _LANE), lambda i, s: (i * n_super + s, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                ((b // _ROWS) * n_super * _ROWS * n_all, _LANE), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM((_ROWS * n_all, 3 * (g["nd_pad"] + g["np_pad"])), jnp.float32),
            ],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )
        wflat = kernel(data3.astype(jnp.float32), ch, scale, rx, pack)
        # stream-major block rows -> the symbol-major [B, syms*128] layout
        # the epilogue expects (cheap HBM shuffle vs the demod FLOPs)
        return (
            wflat.reshape(b // _ROWS, n_super, _ROWS, n_all, _LANE)
            .transpose(0, 2, 1, 3, 4)
            .reshape(b, n_super * n_all * _LANE)
        )

    # unreachable for every shipped profile: sym or fft is a 128-multiple
    # (standard 576/512, acoustic 640, narrowband 768). The v2 strided-copy
    # kernel that handled this case measured ~1.5x slower than plain XLA
    # and was retired when the body-extraction prologue above made the flat
    # kernel universal.
    raise NotImplementedError(
        f"profile {profile.name}: neither symbol_len ({sym}) nor fft_size "
        f"({fft}) is a multiple of {_LANE}"
    )


def _stream_demod_words_pair(
    data: jnp.ndarray,
    ch: jnp.ndarray,
    scale: jnp.ndarray,
    mode: ModemMode,
    n_sym: int,
    interpret: bool,
) -> jnp.ndarray:
    """Pair-slot variant of the gridded streaming demod (see
    _chunk_stream_pair_kernel): rows carry 2-symbol super-slots, the out
    block is [R, 2*128]. Same contract as _stream_demod_words."""
    profile = mode.profile
    b = data.shape[0]
    sym = profile.symbol_len
    slot = 2 * sym
    g = _geometry(profile)
    n_pairs = -(-n_sym // 2)
    g_pairs = min(8, n_pairs)  # 8 pairs x 8 streams = 64 rows/group
    n_groups = -(-n_pairs // g_pairs)
    sub_groups = min(_STREAM_SUBGROUPS, n_groups)
    n_all = sub_groups * g_pairs
    super_len = n_all * slot
    n_super = -(-n_groups // sub_groups)
    need = n_super * super_len
    if data.shape[1] < need:
        data = jnp.pad(data, ((0, 0), (0, need - data.shape[1])))
    data = data[:, :need]
    rx2 = jnp.asarray(_rx_sections_pair(profile))
    pack = jnp.asarray(_pack_matrix(mode))
    sect2 = rx2.shape[1]

    data3 = data.reshape(b, n_super * n_all, slot)
    kernel = pl.pallas_call(
        partial(_chunk_stream_pair_kernel, mode=mode, n_all=n_all, slot=slot),
        grid=(b // _ROWS, n_super),
        in_specs=[
            pl.BlockSpec((_ROWS, n_all, slot), lambda i, s: (i, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, ch.shape[1]), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(rx2.shape, lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pack.shape, lambda i, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_ROWS * n_all, 2 * _LANE), lambda i, s: (i * n_super + s, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            ((b // _ROWS) * n_super * _ROWS * n_all, 2 * _LANE), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((_ROWS * n_all, 3 * (g["nd_pad"] + g["np_pad"])), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    wflat = kernel(data3.astype(jnp.float32), ch, scale, rx2, pack)
    # stream-major pair rows -> symbol-major [B, syms*128]: pair k's A/B
    # halves become symbols 2k, 2k+1
    del sect2
    return (
        wflat.reshape(b // _ROWS, n_super, _ROWS, n_all, 2, _LANE)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(b, n_super * n_all * 2 * _LANE)
    )


def _words_to_bits(words: jnp.ndarray, mode: ModemMode, n_sym: int) -> jnp.ndarray:
    """Packed words [B, >= n_sym*128] -> hard bits [B, n_sym*bits_per_symbol]."""
    g = _geometry(mode.profile)
    b = words.shape[0]
    nd = g["nd"]
    bps = mode.bps
    n_words = -(-(nd * bps) // 16)
    w = words.reshape(b, -1, _LANE)[:, :n_sym, :n_words].astype(jnp.int32)
    shifts = jnp.arange(15, -1, -1, dtype=jnp.int32)
    bits = ((w[..., None] >> shifts) & 1).astype(jnp.int8)
    bits = bits.reshape(b, n_sym, n_words * 16)[:, :, : nd * bps]
    return bits.reshape(b, n_sym * nd * bps)


@partial(jax.jit, static_argnames=("mode", "n_sym", "interpret", "force_extract"))
def decode_chunks_fused_stream(
    frames: jnp.ndarray,
    mode: ModemMode,
    n_sym: int,
    interpret: bool = False,
    force_extract: bool = False,
) -> jnp.ndarray:
    """Length-unbounded fused chunk decode: [B, >=(3+n_sym)*sym] frames ->
    hard bits [B, n_sym*bits_per_symbol] int8.

    Same contract as decode_chunks_fused, but the frame never enters VMEM
    whole: the XLA prologue computes the per-frame peak scale and the
    sectioned CE (with the SAME dot_bf16x3 formulation as the resident
    kernel, so the two kernel paths and the XLA path stay
    decision-identical), and the gridded _chunk_stream_flat_kernel
    demodulates symbol-group blocks with double-buffered HBM DMA."""
    profile = mode.profile
    b, t = frames.shape
    if b % _ROWS:
        pad = _ROWS - b % _ROWS
        return decode_chunks_fused_stream(
            jnp.pad(frames, ((0, pad), (0, 0))), mode, n_sym, interpret, force_extract
        )[:b]
    sym = profile.symbol_len
    cp = profile.cp_len
    frames = frames.astype(jnp.float32)
    mx = jnp.abs(frames).max(axis=-1, keepdims=True)
    scale = jnp.where(mx > 1e-6, 1.0 / jnp.where(mx > 1e-6, mx, 1.0), 1.0)
    rx = jnp.asarray(_rx_sections(profile))
    kn = jnp.asarray(_ce_known_row(profile))
    need_head = 3 * sym
    if t < need_head:
        frames = jnp.pad(frames, ((0, 0), (0, need_head - t)))
    body_ce = frames[:, 2 * sym + cp : 3 * sym] * scale
    ch = dot_bf16x3(body_ce, rx) * kn
    data = frames[:, 3 * sym + cp :]
    words = _stream_demod_words(data, ch, scale, mode, n_sym, interpret, force_extract)
    return _words_to_bits(words, mode, n_sym)


@partial(jax.jit, static_argnames=("mode", "max_syms", "interpret"))
def decode_long_fused(
    signals: jnp.ndarray,
    n_valid: jnp.ndarray,
    min_pos: jnp.ndarray,
    mode: ModemMode,
    max_syms: int,
    interpret: bool = False,
) -> dict:
    """Full-pipeline decode for frames past the resident kernel's VMEM gate:
    XLA front-end (preprocess + strided Schmidl-Cox detect + Toeplitz xcorr
    refine + dynamic-slice re-align — all HBM-resident, length-insensitive)
    feeding the STREAMING demod kernel, where the FLOPs of a long frame
    actually live. Same output contract as decode_fused; decision-identical
    to the XLA pipeline on CPU/interpret (the front-end IS the XLA
    formulation; demod shares the bf16x3 DFT)."""
    from audio_modem_tpu import sync as _sync

    profile = mode.profile
    g = _geometry(profile)
    b, t = signals.shape
    if b % _ROWS:
        pad = _ROWS - b % _ROWS
        out = decode_long_fused(
            jnp.pad(signals, ((0, pad), (0, 0))),
            jnp.pad(jnp.asarray(n_valid, jnp.int32), (0, pad)),
            jnp.pad(jnp.asarray(min_pos, jnp.int32), (0, pad)),
            mode,
            max_syms,
            interpret,
        )
        return {k: v[:b] for k, v in out.items()}

    sym = profile.symbol_len
    cp = profile.cp_len
    n_valid = jnp.asarray(n_valid, jnp.int32)
    min_pos = jnp.asarray(min_pos, jnp.int32)
    sig = _sync.preprocess(signals, n_valid)
    al_len = (3 + max_syms) * sym
    ext = jnp.pad(sig, ((0, 0), (0, al_len)))

    def front(s, nv, mp):
        coarse, cmetric = _sync.detect_preamble(
            s, profile, nv, min_pos=mp, stride=COARSE_STRIDE
        )
        start, fine_metric = _sync.refine_xcorr(s, jnp.maximum(coarse, 0), profile, nv)
        aligned = jax.lax.dynamic_slice(s, (start,), (al_len,))
        return coarse, cmetric, start, fine_metric, aligned

    coarse, cmetric, start, fine, aligned = jax.vmap(front)(ext, n_valid, min_pos)

    rx = jnp.asarray(_rx_sections(profile))
    kn = jnp.asarray(_ce_known_row(profile))
    ch = dot_bf16x3(aligned[:, 2 * sym + cp : 3 * sym], rx) * kn
    ones = jnp.ones((b, 1), jnp.float32)  # preprocess already normalized
    words = _stream_demod_words(aligned[:, 3 * sym + cp :], ch, ones, mode, max_syms, interpret)
    bits = _words_to_bits(words, mode, max_syms)

    pilot_mask = profile.pilot_mask_active
    nd, npi = g["nd"], g["npi"]
    nd_pad, np_pad = g["nd_pad"], g["np_pad"]
    n_active = profile.num_active_subs
    dpos = jnp.asarray(np.nonzero(~pilot_mask)[0])
    ppos = jnp.asarray(np.nonzero(pilot_mask)[0])
    ch_re = (
        jnp.zeros((b, n_active), jnp.float32)
        .at[:, dpos].set(ch[:, :nd])
        .at[:, ppos].set(ch[:, 2 * nd_pad : 2 * nd_pad + npi])
    )
    ch_im = (
        jnp.zeros((b, n_active), jnp.float32)
        .at[:, dpos].set(ch[:, nd_pad : nd_pad + nd])
        .at[:, ppos].set(ch[:, 2 * nd_pad + np_pad : 2 * nd_pad + np_pad + npi])
    )
    from audio_modem_tpu.sync import XCORR_THRESHOLD

    return {
        "start": start,
        "coarse": coarse,
        "coarse_metric": cmetric,
        "fine_metric": fine,
        "detected": (coarse >= 0) & (fine >= XCORR_THRESHOLD),
        "bits": bits,
        "ch_re": ch_re,
        "ch_im": ch_im,
    }


@partial(jax.jit, static_argnames=("mode", "n_sym", "interpret"))
def decode_chunks_fused(
    frames: jnp.ndarray,
    mode: ModemMode,
    n_sym: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused batch_decode_chunk_frames: [B, >=(3+n_sym)*sym] frames ->
    hard bits [B, n_sym * bits_per_symbol] int8. Decision-identical to the
    XLA path (parallel.batch.batch_decode_chunk_frames) on CPU/interpret;
    on hardware, agreement holds up to a ~5e-5 noise-borderline-bin band
    (XLA and Mosaic schedule the shared bf16x3 DFT's passes differently —
    see tests/test_kernels_tpu.py)."""
    profile = mode.profile
    g = _geometry(profile)
    b, t = frames.shape
    if b % _ROWS:
        pad = _ROWS - b % _ROWS
        return decode_chunks_fused(jnp.pad(frames, ((0, pad), (0, 0))), mode, n_sym, interpret)[:b]
    g_syms = _group_syms(profile.symbol_len, n_sym)
    syms_padded = -(-n_sym // g_syms) * g_syms  # kernel loads whole groups
    need = (3 + syms_padded) * profile.symbol_len + profile.cp_len
    t_pad = _round_up(max(t, need), _LANE)
    if t_pad != t:
        frames = jnp.pad(frames, ((0, 0), (0, max(0, t_pad - t))))
        frames = frames[:, :t_pad]

    rx = jnp.asarray(_rx_sections(profile))
    kn = jnp.asarray(np.tile(_ce_known_row(profile), (_ROWS, 1)))
    pack = jnp.asarray(_pack_matrix(mode))

    kernel = pl.pallas_call(
        partial(_chunk_kernel, mode=mode, max_syms=n_sym),
        grid=(b // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(rx.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(kn.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pack.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_ROWS, syms_padded * _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, syms_padded * _LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_ROWS * g_syms, profile.fft_size), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    words = kernel(frames.astype(jnp.float32), rx, kn, pack)

    nd = g["nd"]
    bps = mode.bps
    n_words = -(-(nd * bps) // 16)
    w = words.reshape(b, syms_padded, _LANE)[:, :n_sym, :n_words].astype(jnp.int32)
    shifts = jnp.arange(15, -1, -1, dtype=jnp.int32)
    bits = ((w[..., None] >> shifts) & 1).astype(jnp.int8)
    bits = bits.reshape(b, n_sym, n_words * 16)[:, :, : nd * bps]
    return bits.reshape(b, n_sym * nd * bps)


@partial(jax.jit, static_argnames=("mode", "max_syms", "interpret"))
def decode_fused(
    signals: jnp.ndarray,
    n_valid: jnp.ndarray,
    min_pos: jnp.ndarray,
    mode: ModemMode,
    max_syms: int,
    interpret: bool = False,
) -> dict:
    """Fused batched full-pipeline decode: [B, T] raw signals ->
    dict(start, coarse, coarse_metric, fine_metric, detected,
    bits [B, max_syms*bits_per_symbol] int8, ch_re, ch_im [B, n_active]).

    Decision-identical to parallel.batch.batch_decode_signals /
    decoder._decode_core (asserted in tests/test_kernels.py): identical
    refined starts, detection flags, and payload bits for every symbol that
    lies inside the frame. Three benign deviations: the committed coarse
    index may land on an earlier sample of the same metric plateau; bits of
    JUNK symbols past the frame end (which every consumer truncates, like
    the reference's junk-tail demod, modem.js:368) may flip; and ON
    HARDWARE, payload bits agree up to a ~5e-5 noise-borderline-bin band
    (XLA vs Mosaic scheduling of the shared bf16x3 DFT; exact on
    CPU/interpret — see tests/test_kernels_tpu.py).
    """
    from audio_modem_tpu.sync import XCORR_THRESHOLD

    profile = mode.profile
    g = _geometry(profile)
    b, t = signals.shape
    if b % _ROWS:
        pad = _ROWS - b % _ROWS
        out = decode_fused(
            jnp.pad(signals, ((0, pad), (0, 0))),
            jnp.pad(jnp.asarray(n_valid, jnp.int32), (0, pad)),
            jnp.pad(jnp.asarray(min_pos, jnp.int32), (0, pad)),
            mode,
            max_syms,
            interpret,
        )
        return {k: v[:b] for k, v in out.items()}

    sym = profile.symbol_len
    g_syms = _group_syms(sym, max_syms)
    n_groups = -(-max_syms // g_syms)
    syms_padded = n_groups * g_syms
    l_al = _round_up((3 + syms_padded) * sym + profile.cp_len, _LANE)
    t_pad = _rx_t_pad(t, l_al)

    _, t_energy = _template(profile)
    bank = jnp.asarray(_template_bank(profile))
    rx = jnp.asarray(_rx_sections(profile))
    kn = jnp.asarray(np.tile(_ce_known_row(profile), (_ROWS, 1)))
    pack = jnp.asarray(_pack_matrix(mode))
    m1_np, m2_np = _scan_masks()
    m1 = jnp.asarray(m1_np)
    m2 = jnp.asarray(m2_np)
    sect = rx.shape[1]

    kernel = pl.pallas_call(
        partial(
            _receive_kernel,
            mode=mode,
            t_energy=t_energy,
            max_syms=max_syms,
            t_pad=t_pad,
            l_al=l_al,
        ),
        grid=(b // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bank.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(rx.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(kn.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pack.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(m1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(m2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, sect), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, syms_padded * _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, sect), jnp.float32),
            jax.ShapeDtypeStruct((b, syms_padded * _LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_ROWS, t_pad), jnp.float32),
            pltpu.VMEM((_ROWS, l_al), jnp.float32),
            pltpu.VMEM((_ROWS * g_syms, profile.fft_size), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    start, fine, coarse, cmetric, ch, words = kernel(
        jnp.asarray(n_valid, jnp.int32).reshape(b, 1),
        jnp.asarray(min_pos, jnp.int32).reshape(b, 1),
        signals.astype(jnp.float32),
        bank,
        rx,
        kn,
        pack,
        m1,
        m2,
    )

    # ---- XLA-side epilogue: unpack words -> bits, reassemble channel ----
    nd, npi = g["nd"], g["npi"]
    nd_pad, np_pad = g["nd_pad"], g["np_pad"]
    bps = mode.bps
    n_words = -(-(nd * bps) // 16)
    w = words.reshape(b, syms_padded, _LANE)[:, :, :n_words].astype(jnp.int32)
    shifts = jnp.arange(15, -1, -1, dtype=jnp.int32)
    bits = ((w[..., None] >> shifts) & 1).astype(jnp.int8)
    bits = bits.reshape(b, syms_padded, n_words * 16)[:, :, : nd * bps]
    bits = bits[:, :max_syms].reshape(b, max_syms * nd * bps)

    pilot_mask = profile.pilot_mask_active
    n_active = profile.num_active_subs
    dpos = jnp.asarray(np.nonzero(~pilot_mask)[0])
    ppos = jnp.asarray(np.nonzero(pilot_mask)[0])
    ch_re = (
        jnp.zeros((b, n_active), jnp.float32)
        .at[:, dpos]
        .set(ch[:, :nd])
        .at[:, ppos]
        .set(ch[:, 2 * nd_pad : 2 * nd_pad + npi])
    )
    ch_im = (
        jnp.zeros((b, n_active), jnp.float32)
        .at[:, dpos]
        .set(ch[:, nd_pad : nd_pad + nd])
        .at[:, ppos]
        .set(ch[:, 2 * nd_pad + np_pad : 2 * nd_pad + np_pad + npi])
    )

    coarse = coarse[:, 0]
    fine = fine[:, 0]
    return {
        "start": start[:, 0],
        "coarse": coarse,
        "coarse_metric": cmetric[:, 0],
        "fine_metric": fine,
        "detected": (coarse >= 0) & (fine >= XCORR_THRESHOLD),
        "bits": bits,
        "ch_re": ch_re,
        "ch_im": ch_im,
    }
