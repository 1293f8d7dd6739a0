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


# --- Count-Min sketch (mergeable cell table) --------------------------------

CM_DEPTH = 4
CM_WIDTH = 1024


def _cm_probes(col: "F.Column", depth: int, width: int):
    """The (row, pos) probe construction BOTH the writer and the reader
    use — one source of truth for the salt format and hash recipe (a
    drift between the two sides silently zeroes every estimate)."""
    from pyspark.sql import functions as F

    from supplier_performance_data_pipeline_spark.operators.sampling import (
        md5_mod,
    )

    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    md5_mod(col, f"cm{r}|", width).alias("pos"),
                )
                for r in range(depth)
            ]
        )
    )


def cm_cell_table(
    df: DataFrame, col: str, depth: int = CM_DEPTH, width: int = CM_WIDTH
) -> DataFrame:
    """Count-Min sketch as a (row, pos, cnt) cell DataFrame — the
    mergeable frequency summary (Cormode & Muthukrishnan '05): est(x) =
    min over rows of cell[row][h_row(x)] is ALWAYS >= the true count
    (cells only ever add), with overestimate <= 2n/width at probability
    1 - 2^-depth per query. Unlike the Misra-Gries summary the cell
    table is a reproducible VALUE (no arrival-order dependence), so it
    is hash-verifiable cross-engine.

    NULL keys are skipped (same contract as mg_candidate_items —
    hashed NULLs would land in cells no equality probe can reach).
    CONTRACT: the reader must be called with the SAME (depth, width)
    the table was built with — the cell table carries no metadata, and
    a mismatch silently misses cells (est 0 for present items). Keep
    both on the shared defaults unless you thread the pair explicitly.

    Plan shape: one scan, a x`depth` generator expansion (pure
    projection), one (row, pos)-keyed aggregate whose map-side combine
    collapses to <= depth x width cells per partition before the
    shuffle — the exchange carries the SKETCH, not the data. Sketches
    of two table halves merge by cellwise addition (tested), which is
    what makes this the incremental/distributed counting primitive.
    Hashing is the engine's portable md5_mod recipe, so a DuckDB
    oracle reproduces every cell."""
    from pyspark.sql import functions as F

    cells = df.filter(F.col(col).isNotNull()).select(
        _cm_probes(F.col(col), depth, width).alias("c")
    )
    return (
        cells.select("c.row", "c.pos")
        .groupBy("row", "pos")
        .agg(F.count("*").alias("cnt"))
    )


def cm_estimates(
    cells: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-query the sketch: (item, est) with est = min over the
    depth rows of the item's cell. (depth, width) MUST match the
    builder's — see the cm_cell_table contract. NULL query items are
    dropped (they were never inserted). The cell table is sketch-sized
    (<= depth x width rows) and broadcasts; the per-item min is a
    depth-row aggregate — no scan of the original data. Absent cells
    count 0 (an item never inserted estimates 0, not NULL)."""
    from pyspark.sql import functions as F

    probes = (
        items.filter(F.col(item_col).isNotNull())
        .select(
            F.col(item_col).alias("item"),
            _cm_probes(F.col(item_col), depth, width).alias("p"),
        )
        .select("item", "p.row", "p.pos")
    )
    joined = probes.join(F.broadcast(cells), ["row", "pos"], "left")
    return (
        joined.groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
