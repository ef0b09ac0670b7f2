"""Benchmark support: deterministic synthetic corpora + query sets."""

from diagon_tpu.bench.synthetic import generate_reuters_like  # noqa: F401
from diagon_tpu.bench.queries import REUTERS_QUERIES  # noqa: F401
