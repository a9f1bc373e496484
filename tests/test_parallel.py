"""Sharding tests on the 8-virtual-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8) + graft entry points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_modem_tpu import framing
from audio_modem_tpu.configs import MODES
from audio_modem_tpu.ops.bits import bits_to_bytes
from audio_modem_tpu.parallel import (
    batch_decode_chunk_frames,
    batch_decode_signals,
    batch_loopback_step,
    make_mesh,
    shard_batch,
)
from audio_modem_tpu.parallel.batch import pad_signals


@pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="needs the 8-virtual-device CPU mesh (conftest default); a real "
    "single-chip backend has 1 device by construction",
)
def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_batch_decode_chunk_frames_matches_scalar():
    mode = MODES["QPSK"]
    p = mode.profile
    rng = np.random.default_rng(5)
    chunks = [rng.bytes(200) for _ in range(4)]
    frames, n_sym = [], framing.num_symbols_for_payload(211, mode)
    pre = p.silence_pre_chunk(False)
    for seq, c in enumerate(chunks):
        f = framing.build_data_chunk_frame(c, seq, mode)[pre:]
        frames.append(f[: (3 + n_sym) * p.symbol_len])
    batch = jnp.asarray(np.stack(frames))
    bits = np.asarray(batch_decode_chunk_frames(batch, mode, n_sym))
    for seq, c in enumerate(chunks):
        parsed = framing.parse_payload_bytes(bits_to_bytes(bits[seq]), min_len=6)
        assert isinstance(parsed, framing.DataFrame)
        assert parsed.crc_valid and parsed.seq_num == seq and parsed.data == c


def test_batch_decode_signals_sharded():
    mode = MODES["BPSK-ACOUSTIC"]
    mesh = make_mesh()
    rng = np.random.default_rng(6)
    sigs = [
        framing.build_data_chunk_frame(rng.bytes(64), seq, mode) for seq in range(8)
    ]
    signals, n_valid = pad_signals(sigs, pad_len=len(sigs[0]) + mode.profile.symbol_len)
    s = shard_batch(jnp.asarray(signals), mesh)
    nv = shard_batch(jnp.asarray(n_valid), mesh)
    max_syms = 16
    out = batch_decode_signals(s, nv, mode, max_syms)
    assert bool(np.asarray(out["detected"]).all())
    sym = mode.profile.symbol_len
    for i in range(8):
        start = int(np.asarray(out["start"])[i])
        n_sym = (int(n_valid[i]) - (start + 3 * sym)) // sym
        bits = np.asarray(out["bits"][i])[: min(n_sym, max_syms) * mode.bits_per_symbol]
        parsed = framing.parse_payload_bytes(bits_to_bytes(bits), min_len=6)
        assert isinstance(parsed, framing.DataFrame) and parsed.crc_valid
        assert parsed.seq_num == i


def test_loopback_step_sharded_ber_zero():
    mode = MODES["QPSK"]
    mesh = make_mesh()
    rng = np.random.default_rng(7)
    n_sym = 3
    bits = rng.integers(0, 2, (16, n_sym * mode.bits_per_symbol), dtype=np.int8)
    b = shard_batch(jnp.asarray(bits), mesh)
    ber, out_bits = batch_loopback_step(b, jax.random.PRNGKey(1), mode, n_sym, 30.0)
    assert float(ber) == 0.0
    assert np.array_equal(np.asarray(out_bits), bits)


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape[0] == args[0].shape[0]

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


def test_shardmap_explicit_collective_ber():
    """shard_map + pmean over the 8-device mesh agrees with the GSPMD path."""
    from audio_modem_tpu.parallel.batch import shardmap_loopback_ber

    mode = MODES["QPSK"]
    mesh = make_mesh()
    rng = np.random.default_rng(9)
    n_sym = 2
    bits = jnp.asarray(rng.integers(0, 2, (16, n_sym * mode.bits_per_symbol), dtype=np.int8))
    key = jax.random.PRNGKey(3)
    ber = shardmap_loopback_ber(shard_batch(bits, mesh), key, mode, n_sym, 30.0, mesh)
    assert float(ber) == 0.0
    noisy = shardmap_loopback_ber(shard_batch(bits, mesh), key, mode, n_sym, -5.0, mesh)
    assert 0.05 < float(noisy) < 0.6


def test_multihost_dryrun_two_processes():
    """The DCN story (SURVEY §2 parallelism table): a real 2-process
    jax.distributed cluster (2 x 2 virtual CPU devices, one global mesh)
    runs the sharded loopback + decode step; children raise on any
    BER/detection failure."""
    from audio_modem_tpu.parallel.multihost import run_dryrun

    run_dryrun(n_processes=2, devices_per_process=2)
