"""Tokenizer benchmark (reference ``benchmarks/TokenizerBenchmark.cpp``).

Mirrors BM_FastTokenizer vs BM_IStringStreamTokenizer: the native C++
tokenizer (FastTokenizer role) vs the pure-Python standard tokenizer
(the slow-control role), tokens/s over Reuters-shaped text at several
document lengths. Prints ONE JSON line to stdout; progress to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    from diagon_tpu.analysis.tokenizers import _standard_tokenize_ascii_py
    from diagon_tpu.bench.synthetic import corpus_documents
    from diagon_tpu.native import _native

    texts = []
    for doc in corpus_documents(num_docs=2000):
        for f in doc.fields:
            if f.name == "body":
                texts.append(f.value)
    n_tokens = sum(len(_standard_tokenize_ascii_py(t)) for t in texts)
    log(f"{len(texts)} bodies, {n_tokens} tokens")

    def best(fn):
        ts = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return n_tokens / min(ts)

    result = {"metric": "tokenizer", "tokens": n_tokens, "unit": "tokens/s"}
    if _native is not None:
        native_tps = best(
            lambda: [_native.standard_tokenize_ascii(t) for t in texts]
        )
        log(f"native tokenizer: {native_tps:,.0f} tokens/s")
        result["native_tokens_per_s"] = round(native_tps)
    py_tps = best(lambda: [_standard_tokenize_ascii_py(t) for t in texts])
    log(f"python tokenizer: {py_tps:,.0f} tokens/s")
    result["python_tokens_per_s"] = round(py_tps)
    # reference FastTokenizer: ~40M tokens/s on server cores
    # (TokenizerBenchmark.cpp); the native path is the parity claim
    result["value"] = result.get(
        "native_tokens_per_s", result["python_tokens_per_s"]
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
