"""Scale-safe exact global ranking — ROW_NUMBER / NTILE over
entity-grain tables without a single-partition window.

The trap these helpers exist to avoid: ``Window.orderBy(...)`` with no
``partitionBy`` plans as ONE partition sorting the whole input — fine
for a 25-row nation dim, fatal for a customer/user table that is
billions of rows at 100 TB (the reference's dashboards rank suppliers,
15 rows, so it never hits this; our extension queries rank customers
and users, which do).

Technique — the same two-level parallel prefix the lateness histogram
uses (plans/queries_events.py, ``events_lateness_histogram``), applied
to ranking:

1. assign every row a BLOCK that is monotone with the target sort
   order (a function of the leading sort key only, so ties always
   share a block);
2. per-block counts — one map-side-combined aggregate;
3. cumulative offsets over the BLOCK table — an unpartitioned window,
   but over a bounded-cardinality input (<= number of blocks);
4. intra-block ``row_number`` — a window PARTITIONED by block,
   embarrassingly parallel;
5. global rank = block offset + intra-block rank.

NTILE then needs no window at all: the SQL-standard bucket is a closed
form of (rank, total, k) — ``q = n div k, r = n mod k``, the first
``r`` buckets hold ``q + 1`` rows — identical in Spark and DuckDB, so
an oracle written with plain ``NTILE(k) OVER (ORDER BY ...)`` stays
valid when the Spark side computes the rank this way.

Block choice:
- bounded-domain leading key (a day count, an event tally): use the
  key itself — every distinct value is a block.
- continuous / near-unique key (revenue): ``quantile_blocks`` cuts the
  domain at approx_percentile points. Cut PLACEMENT only balances
  work; the rank is exact wherever the cuts land, so the sketch's
  approximation is harmless by construction.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["quantile_blocks", "blocked_row_number", "ntile_from_rank"]


def quantile_blocks(
    df: DataFrame,
    value_col: str,
    *,
    desc: bool = False,
    num_blocks: int = 64,
    accuracy: int = 10_000,
    out: str = "_blk",
    materialize: bool = True,
    reliable: bool = False,
    release: list | None = None,
) -> DataFrame:
    """Add a block column monotone with the (``value_col``, asc/desc)
    order, using approx_percentile cut points collected ONCE to the
    driver (a bounded 1-row / <= num_blocks-1-double action at plan
    build time) and inlined as a literal binary-search CASE tree.

    The block is the count of cut points STRICTLY beyond the row's
    value in sort direction, so equal values always land in the same
    block and any tie-break ordering stays intra-block. Percentiles are
    taken on the DOUBLE cast — the cast is monotone (non-strict), and
    rows a lossy cast would conflate merely share a block, which is
    always safe: blocks only partition work, never decide order.

    ``materialize`` (default True) localCheckpoints the input first:
    the ranked frame is consumed at least THREE times downstream (the
    eager cuts job here, then blocked_row_number's per-block counts
    and rank join), and the cuts job runs as a SEPARATE job that
    cannot share exchanges with the main one — without truncation the
    whole upstream pipeline (typically a fact-scale aggregation)
    recomputes per consumer, which at 100 TB means scanning the fact
    table twice to rank its aggregate. Pass False only when the
    caller already materialized ``df``.

    ``reliable`` (default False) picks the fault-tolerance/speed trade
    of that materialization. False uses ``localCheckpoint()``: fastest
    (executor-local blocks, no replication), but it TRUNCATES lineage —
    on a real cluster an executor lost after truncation makes its
    blocks unrecoverable and fails the job, so it is only the right
    default on stable executors (and in local mode, where executor ==
    driver). True uses ``persist(StorageLevel.DISK_ONLY)`` + an eager
    count instead: lineage is kept, so a preempted executor's blocks
    recompute from source and the job survives — the price is keeping
    the (possibly long) upstream plan alive and a recompute-on-loss
    that re-reads source partitions. At 100 TB on preemptible
    executors set ``reliable=True``; for a hard durability boundary
    across driver restarts, materialize to a table (or
    ``checkpoint()`` with a checkpoint dir) BEFORE calling and pass
    ``materialize=False``. Both modes feed the identical cuts job and
    CASE tree, so results are invariant to the knob (pinned by
    tests/test_round10_ops.py).

    ``release`` (r10 ADVICE): the reliable-mode persist cannot be
    unpersisted here — the cache must outlive the RETURNED plan's
    consumers (blocked_row_number's counts + rank join run later) —
    so without a handle every reliable call leaks a cache-manager
    entry for the app lifetime (the exact leak the localCheckpoint
    default exists to avoid). Pass a list and the persisted frame is
    appended to it; after the downstream action completes, call
    ``.unpersist()`` on each element. localCheckpoint mode has no
    cache entry and never appends.
    """
    if materialize:
        if reliable:
            from pyspark import StorageLevel

            df = df.persist(StorageLevel.DISK_ONLY)
            if release is not None:
                release.append(df)
            # Eager: make the cache fully populated before ANY
            # consumer plan is built, mirroring localCheckpoint's
            # eagerness (one pass over source, every later job —
            # cuts, per-block counts, rank join — reads disk blocks).
            df.count()
        else:
            df = df.localCheckpoint()
    qs = ", ".join(repr(i / num_blocks) for i in range(1, num_blocks))
    # The cuts are MATERIALIZED on the driver (one bounded 1-row
    # collect of <= num_blocks-1 doubles) and inlined as literals, for
    # two reasons. Determinism: blocked_row_number fans the blocked
    # frame into two branches (per-block counts + the rank join), and
    # correctness requires both to see the SAME cut array —
    # approx_percentile's GK-sketch merge is arrival-order sensitive,
    # so leaving it as a lazy broadcast rests on Spark's exchange-reuse
    # dedup (round-8 ADVICE: with spark.sql.exchange.reuse disabled the
    # branches could block rows differently and corrupt the global
    # rank). Literals make the single evaluation structural. Speed: the
    # previous form scored every row with an aggregate() lambda over
    # all cuts — a Catalyst higher-order function interpreted per
    # element (~63 interpreted comparisons/row at the default 64
    # blocks); literal cuts allow a log-depth binary-search CASE tree
    # of codegen'd comparisons instead. Measured on the sf0.1 lineitem
    # table (600k rows, full blocked_row_number rank end-to-end,
    # local[32], min of 3): 5.48s -> 1.33s at 64 blocks (4.1x) and
    # 21.6s -> 2.72s at 256 blocks (8.0x) — the tree is O(log B) per
    # row vs the lambda's interpreted O(B), so the gap widens with B.
    row = df.agg(
        F.expr(
            f"approx_percentile(CAST({value_col} AS DOUBLE), "
            f"array({qs}), {accuracy})"
        )
    ).first()
    # Drop NULL/NaN cuts: a NaN would break the Python sort below, and
    # as a comparison operand it degenerates to a constant branch
    # anyway (rows with a NaN KEY still block consistently — Spark SQL
    # orders NaN greater than every double, so they take the right
    # branch at every cut and land in the last block, matching ASC
    # window order). Practical bound: the CASE tree materializes one
    # node per cut, so keep num_blocks <= ~1024 or codegen falls back
    # to interpreted evaluation for the oversized method.
    cuts = [
        c
        for c in (row[0] or [])
        if c is not None and not math.isnan(c)
    ]
    if not cuts:
        # empty input (or all-NULL key): one block holds everything
        return df.withColumn(out, F.lit(0).cast("long"))
    cuts.sort()
    vv = F.col(value_col).cast("double")

    def _count_below(lo: int, hi: int) -> Column:
        # Number of cuts c in the sort prefix with c < v (asc) /
        # c <= v (desc-complement), via binary search: cuts are
        # ascending, so the predicate is true on a prefix of indices
        # and the boundary is the count. Each row evaluates one
        # root-to-leaf path of codegen'd comparisons.
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        hit = (
            (F.lit(cuts[mid]) <= vv) if desc else (F.lit(cuts[mid]) < vv)
        )
        return F.when(hit, _count_below(mid + 1, hi)).otherwise(
            _count_below(lo, mid)
        )

    n_le_or_lt = _count_below(0, len(cuts))
    blk = (F.lit(len(cuts)) - n_le_or_lt) if desc else n_le_or_lt
    return df.withColumn(out, blk.cast("long"))


def blocked_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    *,
    blk: str = "_blk",
    rn: str = "rn",
    total: str = "n_total",
) -> DataFrame:
    """Exact global ``ROW_NUMBER() OVER (ORDER BY order_by)`` given a
    block column monotone with that order (caller's contract: if
    ``blk(a) < blk(b)`` then a precedes b, and order-ties share a
    block). Adds ``rn`` (1-based, long) and ``total`` (long, the full
    row count) via one broadcast of the block-offset table.

    The only unpartitioned window runs over the block table (bounded
    by the number of blocks); the per-row ranking window is partitioned
    by block. ``order_by`` must be a total order for the rank to be
    deterministic — same requirement a plain window would have.

    NULL contract: sort keys must be NON-NULL. A NULL leading key
    breaks block monotonicity silently (comparisons against cut points
    return NULL → block 0, while Spark's ASC/DESC window order places
    NULLs first/last), so rank NULLs explicitly: filter them out and
    union a dedicated block, or COALESCE to a sentinel beyond the
    domain — in the SAME way in the oracle.
    """
    counts = df.groupBy(blk).agg(F.count(F.lit(1)).alias("_bn"))
    # Offsets AND the grand total come from the SAME tiny window pass,
    # so the input lineage is referenced exactly twice (counts + the
    # ranking join) — a separate total agg would add a third branch,
    # and branches multiply when rankings nest.
    w_off = Window.orderBy(blk).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(blk).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        blk,
        F.coalesce(F.sum("_bn").over(w_off), F.lit(0))
        .cast("long")
        .alias("_off"),
        F.sum("_bn").over(w_all).cast("long").alias(total),
    )
    w_intra = Window.partitionBy(blk).orderBy(*order_by)
    return (
        df.join(F.broadcast(offsets), blk)
        .withColumn(
            rn,
            (F.col("_off") + F.row_number().over(w_intra)).cast("long"),
        )
        .drop("_off")
    )


def _idiv(a: Column, b: Column) -> Column:
    """Integer floor-division of nonnegative longs. (a - a % b) is
    exactly divisible by b, and the double division of exactly-
    representable operands with an exactly-representable integer
    quotient is exact (IEEE correctly-rounded), so this is precise for
    counts below 2^53 — far beyond any row count."""
    return ((a - (a % b)) / b).cast("long")


def ntile_from_rank(rn: Column, n: Column, k: int) -> Column:
    """SQL-standard ``NTILE(k)`` bucket from a 1-based global rank and
    the total row count — no window. With ``q = n div k`` and
    ``r = n mod k``, the first ``r`` buckets hold ``q + 1`` rows and
    the rest hold ``q`` (both Spark's WindowExec and DuckDB implement
    exactly this remainder-first split). Rows ranked in the large-
    bucket prefix map by div (q+1); the rest offset past it and map by
    div q. ``q = 0`` (n < k) never reaches the q-divisor branch because
    every rank then sits inside the prefix."""
    kk = F.lit(k).cast("long")
    q = _idiv(n, kk)
    r = n % kk
    big = r * (q + 1)
    return (
        F.when(rn <= big, _idiv(rn - 1, q + 1) + 1)
        .otherwise(r + _idiv(rn - big - 1, q) + 1)
        .cast("int")
    )
