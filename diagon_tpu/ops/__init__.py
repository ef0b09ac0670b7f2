"""Device ops: bit unpacking, block scoring, top-k.

Pure-XLA implementations live here; Pallas kernels for the hot paths are in
``diagon_tpu/ops/pallas``. Both are tested against the numpy codecs.
"""
