"""Python UDTF surface (Spark 4 `pyspark.sql.functions.udtf`).

The reference's closest analog is the stateful per-record transformer
(DeduplicateValueTransformer.java:19-69 — one input record, 0..1 output
records); a UDTF generalizes that to one→many. Per the engine's
Python-boundary policy the hot-path chunker is the built-in-HOF query
(queries/llm.py q_doc_chunks — sequence/posexplode/slice, JVM-side);
this UDTF is the API-surface twin for users who need imperative
per-row expansion, parity-pinned against the HOF plan by unit test
(tests/test_operators.py).
"""

from __future__ import annotations

try:
    from pyspark.sql.functions import udtf

    HAS_UDTF = True
except ImportError:  # pragma: no cover - pyspark < 3.5
    HAS_UDTF = False

    def udtf(*a, **k):  # type: ignore
        raise NotImplementedError("pyspark.sql.functions.udtf unavailable")


if HAS_UDTF:

    @udtf(returnType="chunk_idx int, chunk string, n_tok int")
    class ChunkDocument:
        """Split a space-tokenized text into 8-token chunks, stride 6 —
        same contract as q_doc_chunks: starts 1, 7, 13, … up to
        max(len - 2, 1), tail chunks may be short."""

        def eval(self, text: str):
            toks = text.strip().split(" ") if text is not None else []
            n = len(toks)
            stop = max(n - 2, 1)
            idx = 0
            for start in range(1, stop + 1, 6):
                chunk = toks[start - 1 : start + 7]
                if chunk:
                    yield idx, " ".join(chunk), len(chunk)
                idx += 1
else:  # pragma: no cover
    ChunkDocument = None
