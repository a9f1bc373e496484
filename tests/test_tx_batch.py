"""Batched TX synthesis (framing.synthesize_frames / build_data_chunk_frames)
vs the per-frame path: waveform-identical output, generator equivalence in
api.encode_chunked, and end-to-end decodability."""

import numpy as np
import pytest

from audio_modem_tpu import api, framing
from audio_modem_tpu.configs import MODES


def test_batched_matches_per_frame_synthesis():
    """One batched launch must produce the same waveforms as N per-frame
    launches (same bits -> same contraction -> same norm)."""
    rng = np.random.default_rng(0)
    for name in ("QPSK", "BPSK-NARROW"):
        mode = MODES[name]
        chunks = [rng.bytes(96) for _ in range(5)]
        batched = framing.build_data_chunk_frames(chunks, 7, mode)
        for i, c in enumerate(chunks):
            single = framing.build_data_chunk_frame(c, 7 + i, mode)
            assert batched.shape[1] == len(single)
            np.testing.assert_allclose(batched[i], single, atol=2e-6, rtol=0)


def test_batched_matches_per_frame_fec():
    rng = np.random.default_rng(1)
    mode = MODES["QPSK"]
    chunks = [rng.bytes(64) for _ in range(3)]
    batched = framing.build_data_chunk_frames(chunks, 0, mode, fec=True)
    for i, c in enumerate(chunks):
        single = framing.build_data_chunk_frame(c, i, mode, fec=True)
        np.testing.assert_allclose(batched[i], single, atol=2e-6, rtol=0)


def test_synthesize_frames_rejects_mixed_lengths():
    mode = MODES["QPSK"]
    with pytest.raises(ValueError):
        framing.synthesize_frames([b"aa", b"bbb"], mode, 0, 0)


def test_grouped_synthesis_identical(monkeypatch):
    """Batches over _SYNTH_GROUP run the same body under lax.map (HBM
    working-set cap, framing.py) — the grouped launch must be bit-identical
    to the single launch, including the padded-group tail."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    mode = MODES["QPSK"]
    pls = [framing.build_data_chunk_payload(rng.bytes(64), s) for s in range(5)]
    n_sym = framing.num_symbols_for_payload(len(pls[0]), mode)
    u8 = jnp.asarray(np.frombuffer(b"".join(pls), np.uint8).reshape(5, -1))
    ungrouped = np.asarray(framing._synth_frames_core(u8, mode, n_sym, 100, 50))
    framing._synth_frames_core.clear_cache()
    monkeypatch.setattr(framing, "_SYNTH_GROUP", 2)  # 5 -> 3 groups of 2
    try:
        grouped = np.asarray(framing._synth_frames_core(u8, mode, n_sym, 100, 50))
    finally:
        framing._synth_frames_core.clear_cache()  # drop group=2 entry
    assert grouped.shape == ungrouped.shape
    np.testing.assert_array_equal(grouped, ungrouped)


def test_encode_chunked_batched_equals_serial():
    """encode_chunked(batch=4) yields the same frame sequence as batch=1,
    including the uneven final chunk."""
    rng = np.random.default_rng(2)
    mode = MODES["QPSK"]
    data = rng.bytes(mode.chunk_size * 5 + 123)  # 6 chunks, last short
    serial = list(api.encode_chunked(data, mode, "f.bin", batch=1))
    batched = list(api.encode_chunked(data, mode, "f.bin", batch=4))
    assert len(serial) == len(batched) == 7  # meta + 6 data
    for a, b in zip(serial, batched):
        np.testing.assert_allclose(a, b, atol=2e-6, rtol=0)


def test_encode_chunked_batched_roundtrip():
    rng = np.random.default_rng(3)
    mode = MODES["QPSK"]
    data = rng.bytes(mode.chunk_size * 3 + 50)
    signal = np.concatenate(list(api.encode_chunked(data, mode, "r.bin", batch=8)))
    result = api.decode_chunked(signal, mode)
    assert not isinstance(result, framing.FrameError)
    assert result.complete and result.data == data
