"""Misra–Gries heavy-hitters candidates via Arrow ``mapInPandas``.

The frequent-items problem at 100 TB: exact per-item counts need a full
shuffle of every token/user/URL; the Misra–Gries summary needs ONE pass
and k counters per partition. The union of per-partition candidate keys
is a SOUND superset of the true heavy hitters (Agarwal et al.,
"Mergeable Summaries", PODS '12): if an item's global count exceeds
n/(k+1), then by averaging it exceeds n_p/(k+1) in at least one
partition p, where the local MG undercount bound (≤ n_p/(k+1))
guarantees a live counter. So the candidate set can be exact-verified
with counting restricted to candidates — the cheap pass finds, the
bounded pass proves.

This is the engine's second real Arrow path (beside the multimodal
codecs): the sketch state is a plain dict per partition, the batch
interface is pandas, and nothing ever shuffles until the (tiny)
candidate set.

Determinism note: the candidate SET depends on arrival order within
partitions (inherent to MG eviction), so it is a superset contract,
not a reproducible value — queries must surface only order-independent
facts about it (e.g. "zero true heavy hitters missed", proven by an
anti-join against the exact counts of candidates).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame


def mg_candidate_items(df: DataFrame, col: str, k: int) -> DataFrame:
    """One-column DataFrame ``item`` of Misra–Gries candidates.

    Per partition: classic MG with ``k`` counters — increment a live
    counter, open one if fewer than ``k`` are live, else decrement all
    (dropping zeros). Emits each partition's surviving keys; the
    global ``distinct`` union is the candidate superset of every item
    with global frequency > n/(k+1). One scan, zero shuffle until the
    candidate union (≤ k rows per partition). The output column keeps
    the SOURCE column's type (declared from ``df.schema``), so joins
    back against the typed source never silently stringify."""
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [T.StructField("item", df.schema[col].dataType, True)]
    )

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"item": pd.Series(list(counters), dtype="object")})

    return df.select(col).mapInPandas(summarize, out_schema).distinct()
