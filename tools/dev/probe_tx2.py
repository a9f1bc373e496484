"""Round-4 dev probe: TX stage cost attribution at batch 4096 (bit-unpack vs
IFFT contraction vs CP fold) behind the 7.3 Gsps TX figure in docs/bench_r4_local.json."""
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_amt_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from audio_modem_tpu.configs import MODES
from audio_modem_tpu import framing
from audio_modem_tpu.framing import _synth_frames_body, build_data_chunk_payload, num_symbols_for_payload
from functools import partial

T0 = time.time()
def log(m): print(f"[+{time.time()-T0:6.1f}s] {m}", flush=True)

mode = MODES["QPSK"]; p = mode.profile
rng = np.random.default_rng(0)
chunk = mode.chunk_size
n_sym = num_symbols_for_payload(chunk + 11, mode)
pre, post = p.silence_pre_chunk(False), p.silence_post_chunk()
nb, depth = 4096, 4
pls = [build_data_chunk_payload(rng.bytes(chunk), s) for s in range(nb)]
u8 = jax.device_put(jnp.asarray(np.frombuffer(b"".join(pls), np.uint8).reshape(nb, -1)))
enc = jax.jit(lambda u: _synth_frames_body(u, mode, n_sym, pre, post))
try:
    out = jax.block_until_ready(enc(u8)); log(f"single-group B=4096 compiled, out {out.shape}")
    _ = np.asarray(out[0, :8])
    total = out.shape[0] * out.shape[1]
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        for _ in range(depth):
            out = enc(u8)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t)
    log(f"single-group B=4096: {best/depth*1e3:7.2f} ms/launch  {total*depth/best/1e6:8.0f} Msps")
except Exception as e:
    log(f"single-group B=4096 FAILED: {type(e).__name__}: {str(e)[:300]}")
log("done")
