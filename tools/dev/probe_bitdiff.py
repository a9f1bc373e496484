"""Round-4 dev probe: proved kernel-vs-XLA bit differences under noise were
sub-LSB soft-metric ties, not a kernel bug (decision-identical routing tests).

Diagnose kernel-vs-XLA bit differences under noise on hardware.
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_amt_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from audio_modem_tpu import framing
from audio_modem_tpu.configs import MODES
from audio_modem_tpu.kernels.receive import decode_chunks_fused_stream
from audio_modem_tpu.ops.bits import bits_to_bytes
from audio_modem_tpu.parallel.batch import _batch_decode_chunk_frames_xla

T0 = time.time()


def log(m):
    print(f"[+{time.time() - T0:6.1f}s] {m}", flush=True)


for name, nbytes in (("QPSK", 32768), ("BPSK-NARROW", 512)):
    mode = MODES[name]
    p = mode.profile
    sym = p.symbol_len
    rng = np.random.default_rng(0)
    nsym = framing.num_symbols_for_payload(nbytes + 11, mode)
    payload = rng.bytes(nbytes)
    one = framing.build_data_chunk_frame(payload, 0, mode)
    one = one[p.silence_pre_chunk(False) :][: (3 + nsym) * sym]
    for label, noise in (("clean", 0.0), ("noisy", 0.02)):
        frames = np.tile(one, (8, 1))
        if noise:
            frames += noise * rng.standard_normal(frames.shape).astype(np.float32)
        dev = jax.device_put(jnp.asarray(frames))
        bk = np.asarray(decode_chunks_fused_stream(dev, mode, nsym))
        bx = np.asarray(_batch_decode_chunk_frames_xla(dev, mode, nsym))
        diff = int((bk != bx).sum())
        ok_k = ok_x = 0
        for row_k, row_x in zip(bk, bx):
            pk = framing.parse_payload_bytes(bytes(bits_to_bytes(row_k[: (nbytes + 11 + 4 + 7) * 8])))
            px = framing.parse_payload_bytes(bytes(bits_to_bytes(row_x[: (nbytes + 11 + 4 + 7) * 8])))
            ok_k += isinstance(pk, framing.DataFrame) and pk.crc_valid
            ok_x += isinstance(px, framing.DataFrame) and px.crc_valid
        log(f"{name} {label}: bit diffs {diff}/{bk.size}  crc_valid kernel {ok_k}/8 xla {ok_x}/8")
