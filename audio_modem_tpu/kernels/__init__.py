"""Pallas TPU kernels for the hot ops, plus the selection switch.

receive.py fuses the ENTIRE receive pipeline (preprocess, Schmidl-Cox scan
with first-peak commit, Toeplitz xcorr refinement, channel estimation, EQ,
pilot phase, demap, bit packing) into one VMEM-resident pass per 8-stream
tile — bits in HBM are the only large output.

Selection: kernels_enabled() gates the fused path in decoder.decode_signal
and parallel.batch.batch_decode_signals — on by default on TPU backends,
off elsewhere (the XLA formulation in sync.py/phy.py is the portable path
and the decision-equivalence reference). Override with AMT_KERNELS=1/0.
"""

from __future__ import annotations

import os


def kernels_enabled() -> bool:
    """True when decode paths should dispatch to the fused Pallas kernel."""
    env = os.environ.get("AMT_KERNELS", "").lower()
    if env in ("0", "false", "off"):
        return False
    if env in ("1", "true", "on"):
        return True
    import jax

    return jax.default_backend() == "tpu"
