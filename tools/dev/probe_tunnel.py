"""Round-4 dev probe: tunnel D2H size/RTT/async-overlap measurements behind the
d2h_bound analysis in BENCH_r04 and the one-packed-matrix-per-round design.

Tunnel/TPU microprobes guiding the round-4 perf work.

Answers, on the real chip:
  1. D2H cost vs size: is the speculative-round fetch RTT-bound or
     bandwidth-bound? (BatchReceiver pipe_fetch was 13 ms/round in r3.)
  2. Does copy_to_host_async make a later np.asarray ~free?
  3. Is ONE stacked fetch of K rounds cheaper than K separate fetches?
  4. TX synthesis stage costs at B=512: where do the 13.7 ms/launch go?

Run: timeout 1200 python examples/probe_tunnel.py
"""

from __future__ import annotations

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_amt_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

T0 = time.time()


def log(msg):
    print(f"[+{time.time() - T0:6.1f}s] {msg}", flush=True)


log(f"platform: {jax.devices()[0]}")

# ---- 1. D2H cost vs size ----
f = jax.jit(lambda x: x + 1.0)
for kb in (16, 128, 1024, 8192):
    n = kb * 256  # f32 elements
    a = jax.block_until_ready(f(jnp.zeros((n,), jnp.float32)))
    _ = np.asarray(a)  # first D2H warmup
    best = 1e9
    for _ in range(5):
        a = jax.block_until_ready(f(a))
        t = time.perf_counter()
        _ = np.asarray(a)
        best = min(best, time.perf_counter() - t)
    log(f"D2H {kb:5d} KB: {best * 1e3:7.2f} ms  ({kb / 1024 / best:7.1f} MB/s)")

# ---- 2. copy_to_host_async effectiveness ----
size = 1024 * 256  # 1 MB
arrs = [jax.block_until_ready(f(jnp.full((size,), float(i)))) for i in range(8)]
for a in arrs:
    a.copy_to_host_async()
time.sleep(1.5)  # give the async copies time to land
t = time.perf_counter()
for a in arrs:
    _ = np.asarray(a)
dt_async = time.perf_counter() - t
log(f"8x1MB np.asarray AFTER copy_to_host_async+sleep: {dt_async * 1e3:.2f} ms")

arrs = [jax.block_until_ready(f(jnp.full((size,), float(i)))) for i in range(8)]
t = time.perf_counter()
for a in arrs:
    _ = np.asarray(a)
dt_sync = time.perf_counter() - t
log(f"8x1MB np.asarray cold (no async copy):          {dt_sync * 1e3:.2f} ms")

# ---- 3. stacked fetch vs separate ----
stack = jax.jit(lambda xs: jnp.stack(xs))
arrs = [jax.block_until_ready(f(jnp.full((size,), float(i)))) for i in range(8)]
s = jax.block_until_ready(stack(arrs))
_ = np.asarray(s)
arrs = [jax.block_until_ready(f(jnp.full((size,), float(i)))) for i in range(8)]
t = time.perf_counter()
s = stack(arrs)
_ = np.asarray(s)
dt_stacked = time.perf_counter() - t
log(f"8x1MB ONE stacked fetch:                        {dt_stacked * 1e3:.2f} ms")

# jax.device_get on a list (does it pipeline?)
arrs = [jax.block_until_ready(f(jnp.full((size,), float(i)))) for i in range(8)]
t = time.perf_counter()
_ = jax.device_get(arrs)
dt_get = time.perf_counter() - t
log(f"8x1MB jax.device_get(list):                     {dt_get * 1e3:.2f} ms")

# ---- 4. TX stage costs at B=512 ----
from audio_modem_tpu import phy
from audio_modem_tpu.configs import MODES
from audio_modem_tpu.framing import (
    _synth_frames_core,
    build_data_chunk_payload,
    num_symbols_for_payload,
)
from audio_modem_tpu.ops import constellations as con
from audio_modem_tpu.ops.dft import synthesize_data_symbols

mode = MODES["QPSK"]
p = mode.profile
rng = np.random.default_rng(0)
nb = 512
chunk = mode.chunk_size
pls = [build_data_chunk_payload(rng.bytes(chunk), s) for s in range(nb)]
u8 = jax.device_put(jnp.asarray(np.frombuffer(b"".join(pls), np.uint8).reshape(nb, -1)))
n_sym = num_symbols_for_payload(chunk + 11, mode)
n_bits = n_sym * mode.bits_per_symbol
pre, post = p.silence_pre_chunk(False), p.silence_post_chunk()


def unpack_only(u):
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    b, n_bytes = u.shape
    bits = ((u[:, :, None] >> shifts) & jnp.uint8(1)).reshape(b, n_bytes * 8)
    return jnp.pad(bits, ((0, 0), (0, n_bits - bits.shape[1])))


def map_only(u):
    bits = unpack_only(u)
    grouped = bits.reshape(nb, n_sym, mode.bits_per_symbol)
    re, im = con.map_bits(mode.constellation, grouped)
    return re.sum() + im.sum()


def contract_only(u):
    bits = unpack_only(u)
    return phy.modulate(bits, mode).sum()


def full(u):
    return _synth_frames_core(u, mode, n_sym, pre, post)


for name, fn in (
    ("unpack", lambda u: unpack_only(u).sum()),
    ("unpack+map", map_only),
    ("unpack+map+contract", contract_only),
    ("full synth", full),
):
    j = jax.jit(fn)
    out = jax.block_until_ready(j(u8))
    log(f"TX stage '{name}' compiled")
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        for _ in range(10):
            out = j(u8)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t)
    per = best / 10 * 1e3
    total = nb * (3 + n_sym) * p.symbol_len
    log(f"TX stage '{name}': {per:7.2f} ms/launch  ({total / (best / 10) / 1e6:7.0f} Msps-equiv)")

log("done")
