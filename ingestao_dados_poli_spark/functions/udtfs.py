"""User-defined table functions (PySpark 4 UDTF surface).

A UDTF is the engine's extension point for ROW-GENERATING logic — one
input row, many output rows — that built-in generators (explode,
posexplode, inline, sequence) can't express: stateful parsers, format
sniffers, tokenizers with carry-over. It runs per-partition in a
Python worker with Arrow transfer when ``useArrow=True``, and composes
in SQL via LATERAL correlation, so the slow path stays contained to
the generator itself while Catalyst plans everything around it.

``SlidingWindows`` here is deliberately a DETERMINISTIC generator
(overlapping word windows — the chunk-for-embedding primitive where
adjacent chunks must share context): simple enough that DuckDB can
replicate it for a full value oracle (q140), while exercising the real
plumbing — class-based eval, typed struct output, Arrow batching,
SQL registration + LATERAL join. A parser that genuinely needs state
swaps the body, not the wiring.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="win_idx: bigint, window_text: string, n_words: int", useArrow=True)
class SlidingWindows:
    """Emit overlapping word windows of ``width`` words every
    ``stride`` words. FULL windows only: a document shorter than
    ``width`` emits zero rows — callers wanting a remainder chunk use
    operators/corpus.chunk_documents (non-overlapping, keeps tails).
    """

    def eval(self, text: str, width: int, stride: int):
        if text is None or width < 1 or stride < 1:
            return
        words = text.split(" ")
        n = len(words)
        i = 0
        idx = 0
        while i + width <= n:
            yield idx, " ".join(words[i : i + width]), width
            i += stride
            idx += 1


def register_udtfs(spark: SparkSession) -> None:
    """Make the module's UDTFs callable from SQL (idempotent)."""
    spark.udtf.register("sliding_windows", SlidingWindows)
