"""Round-4 dev probe: frames_per_round sweep that chose the K=8 turbo default.

Experiment: BatchReceiver device-ingest throughput vs frames_per_round.

Usage: python _exp_turbo.py FPR [N_CHUNKS]
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_amt_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audio_modem_tpu import api
from audio_modem_tpu.configs import MODES
from audio_modem_tpu.parallel.multi_receiver import BatchReceiver

fpr = int(sys.argv[1])
n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 64
mode = MODES["QPSK"]
rng = np.random.default_rng(0)
n, block = 64, 65536

data = rng.bytes(mode.chunk_size * n_chunks)
t0 = time.perf_counter()
sig = np.concatenate(list(api.encode_chunked(data, mode, "b.bin", batch=16)))
print(f"signal built: {len(sig)} samples in {time.perf_counter()-t0:.1f}s", flush=True)
dev_blocks = []
for off in range(0, len(sig), block):
    buf = np.zeros((n, block), np.float32)
    seg = sig[off : off + block]
    buf[:, : len(seg)] = seg[None, :]
    dev_blocks.append(jax.device_put(jnp.asarray(buf)))

def feed(rx):
    for b in dev_blocks:
        rx.process_blocks(b)
    rx.flush()

warm = BatchReceiver(mode, n, scan_bucket=block, device_ingest=True, frames_per_round=fpr)
t0 = time.perf_counter()
feed(warm)
warm_t = time.perf_counter() - t0
ok = warm.results()[0]["complete"]
print(f"warm: {warm_t:.1f}s ok={ok}", flush=True)
dt = 1e9
for _ in range(3):
    rx = BatchReceiver(mode, n, scan_bucket=block, device_ingest=True, frames_per_round=fpr)
    t0 = time.perf_counter()
    feed(rx)
    dt = min(dt, time.perf_counter() - t0)
msps = n * len(sig) / dt / 1e6
print(f"chunks={n_chunks:3d} fpr={fpr:3d} ok={ok} best={dt*1e3:7.1f}ms "
      f"msps={msps:8.2f} realtime={msps*1e6/44100:8.0f}", flush=True)

import json
rep = rx.timer.report()
print(json.dumps(rep, indent=1), flush=True)
