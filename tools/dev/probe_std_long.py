"""Round-4 dev probe: standard-profile (sym=576) long-frame kernel-vs-XLA A/B
that set the measured-winner routing in parallel/batch.py (XLA wins ~5-10%).

Hardware A/B: standard-profile (sym=576) long-frame streaming kernel vs XLA.

The flat kernel now handles lane-misaligned profiles via an XLA
body-extraction prologue (kernels/receive.py:_stream_demod_words); this
measures whether it beats plain XLA at batch 64 on a >330k-sample QPSK
frame, to route batch_decode_chunk_frames honestly (VERDICT r3 item 4).
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
from audio_modem_tpu.parallel.batch import _batch_decode_chunk_frames_xla

T0 = time.time()


def log(m):
    print(f"[+{time.time() - T0:6.1f}s] {m}", flush=True)


mode = MODES["QPSK"]
p = mode.profile
sym = p.symbol_len
rng = np.random.default_rng(0)
nsym = framing.num_symbols_for_payload(32768 + 11, mode)
one = framing.build_data_chunk_frame(rng.bytes(32768), 0, mode)
one = one[p.silence_pre_chunk(False) :][: (3 + nsym) * sym]
frames = np.tile(one, (8, 1))
frames += 0.02 * rng.standard_normal(frames.shape).astype(np.float32)
log(f"frame len {one.shape[0]} samples, nsym {nsym}")
dev = jax.block_until_ready(jnp.tile(jax.device_put(jnp.asarray(frames)), (8, 1)))
size = dev.size

bk = bx = None
for name, fn in (
    ("kernel", lambda: decode_chunks_fused_stream(dev, mode, nsym)),
    ("xla", lambda: _batch_decode_chunk_frames_xla(dev, mode, nsym)),
):
    out = jax.block_until_ready(fn())
    if name == "kernel":
        bk = np.asarray(out)
    else:
        bx = np.asarray(out)
    dt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            o = fn()
        jax.block_until_ready(o)
        dt = min(dt, time.perf_counter() - t0)
    log(f"{name}: {dt / 10 * 1e3:7.2f} ms/call  {size * 10 / dt / 1e6:8.0f} Msps")
log(f"bit match kernel vs XLA: {np.array_equal(bk, bx)}")
