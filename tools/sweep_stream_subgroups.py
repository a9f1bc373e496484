"""A/B the streaming demod kernel's grid-step size (_STREAM_SUBGROUPS).

Each grid step of _chunk_stream_flat_kernel demodulates
sub_groups x g_syms symbols per 8-stream block; a bigger step amortizes
fixed per-step cost (DMA setup, scratch rebuild gate, epilogue) against
VMEM pressure. This times decode_chunks_fused_stream on the bench's
long_frame workload (batch-64 ~460k-sample narrowband chunk frames) for
one override value per process (jit caches pin the traced constant).

Usage: python tools/sweep_stream_subgroups.py <subgroups>
Prints one JSON line {"subgroups": v, "msps": rate}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    v = int(sys.argv[1])

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_amt_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from audio_modem_tpu import framing
    from audio_modem_tpu.configs import MODES
    from audio_modem_tpu.kernels import receive

    receive._STREAM_SUBGROUPS = v  # before any trace

    rng = np.random.default_rng(7)
    narrow = MODES["BPSK-NARROW"]
    p = narrow.profile
    nsym = framing.num_symbols_for_payload(512 + 11, narrow)
    one = framing.build_data_chunk_frame(rng.bytes(512), 0, narrow)
    one = one[p.silence_pre_chunk(False) :][: (3 + nsym) * p.symbol_len]
    frames = np.tile(one, (8, 1))
    frames += 0.02 * rng.standard_normal(frames.shape).astype(np.float32)
    dev = jax.block_until_ready(jnp.tile(jax.device_put(jnp.asarray(frames)), (8, 1)))

    fn = lambda: receive.decode_chunks_fused_stream(dev, narrow, nsym)
    jax.block_until_ready(fn())
    _ = np.asarray(fn()[:2, :8])  # first D2H: start paying real RTT
    iters = 16
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn()
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"subgroups": v, "msps": round(dev.size * iters / best / 1e6, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
