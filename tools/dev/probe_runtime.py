"""Round-4 dev probe: whole-runtime Msps vs pipeline depth; motivated the
speculative fetch pipeline (pipeline_depth=8 default) and the consume fast path.

Steady-state BatchReceiver probe: whole-runtime Msps vs pipeline depth.

Mirrors bench.py's device-ingest steady-state stage with knobs, to measure
where the wall goes (dispatch / fetch / consume) after the vectorized
consume fast path, and how deep the speculation pipeline must be for the
~28 ms tunnel D2H to fully overlap.
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_amt_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from audio_modem_tpu import api
from audio_modem_tpu.configs import MODES
from audio_modem_tpu.parallel.multi_receiver import BatchReceiver

T0 = time.time()


def log(m):
    print(f"[+{time.time() - T0:6.1f}s] {m}", flush=True)


mode = MODES["QPSK"]
n, block = 64, 65536
chunk_size = mode.chunk_size
n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 128
rng = np.random.default_rng(0)
data2 = rng.bytes(chunk_size * n_chunks)
sig2 = np.concatenate(list(api.encode_chunked(data2, mode, "b2.bin", batch=16)))
n_blocks = -(-len(sig2) // block)
sig2_dev = jax.device_put(jnp.asarray(np.pad(sig2, (0, n_blocks * block - len(sig2)))))
slice_block = jax.jit(
    lambda s, o: jnp.broadcast_to(
        jax.lax.dynamic_slice(s, (o,), (block,))[None, :], (n, block)
    )
)
dev_blocks = [slice_block(sig2_dev, jnp.int32(i * block)) for i in range(n_blocks)]
jax.block_until_ready(dev_blocks)
log(f"signal ready: {len(sig2)} samples/stream, {n_blocks} blocks")


def feed(rx):
    for b in dev_blocks:
        rx.process_blocks(b)
    rx.flush()


for depth in (8, 16, 32):
    warm = BatchReceiver(mode, n, scan_bucket=block, device_ingest=True, pipeline_depth=depth)
    feed(warm)
    r0 = warm.results()[0]
    assert r0["complete"] and r0["data"] == data2, (depth, r0["missing"])
    best, rep = 1e9, None
    for _ in range(3):
        rx = BatchReceiver(mode, n, scan_bucket=block, device_ingest=True, pipeline_depth=depth)
        t0 = time.perf_counter()
        feed(rx)
        dt = time.perf_counter() - t0
        if dt < best:
            best, rep = dt, rx.timer.report()
    msps = n * len(sig2) / best / 1e6
    log(f"depth {depth}: {best*1e3:7.1f} ms  {msps:7.0f} Msps  stages={rep}")
log("done")
