"""Keyed snapshot merge (MERGE INTO semantics, last-writer-wins).

Warehouse maintenance surface: apply a batch of keyed updates/inserts to
a base snapshot — matched keys take the update row, unmatched update
keys are inserts, untouched base rows pass through. The reference's
DROP-and-recreate idempotency (SURVEY.md §2.1 S4) is the degenerate
whole-table form of this; ``upsert`` is the incremental form.

Plan: tag each side with a precedence, union, keep the top row per key
— ONE key-keyed shuffle (the window partitions by the merge key), no
join. At 100 TB the win over full-outer-join MERGE is that the base
never materializes twice; pair with partitioned output so only
partitions containing updated keys rewrite (dynamic partition
overwrite), which is how table formats (Delta/Iceberg MERGE) scope the
rewrite too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(
    base: DataFrame, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Last-writer-wins keyed merge. ``updates`` must share the base
    schema; duplicate keys WITHIN updates are resolved deterministically
    only if the caller pre-dedupes (assert your own uniqueness — same
    contract as the as-of join's right side)."""
    tagged = updates.withColumn("_prio", F.lit(1)).unionByName(
        base.withColumn("_prio", F.lit(0))
    )
    w = Window.partitionBy(*key_cols).orderBy(F.desc("_prio"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_prio", "_rn")
    )


def scd2_apply(
    base: DataFrame,
    new_versions: DataFrame,
    key_cols: list[str],
    valid_from_col: str = "valid_from",
) -> DataFrame:
    """Slowly-changing-dimension type 2: fold a batch of new attribute
    versions into a versioned history. ``base`` is the existing history
    (or the initial snapshot) carrying ``valid_from``; ``new_versions``
    shares the schema with a later ``valid_from`` and contains only the
    keys whose attributes actually changed (the standard CDC batch
    contract — same caller-side precondition as ``upsert``).

    The closing of superseded rows is derived, not joined: union the
    two sides, then per key ``valid_to = lead(valid_from)`` over the
    version order — a row is current iff nothing newer exists. ONE
    key-keyed shuffle total (the window), no join, no second pass over
    the base — the same reason ``upsert`` beats the full-outer-join
    MERGE at scale. Re-applying the same batch is idempotent in effect:
    equal (key, valid_from) pairs would need caller dedup, but a later
    batch simply extends the chain.
    """
    hist = base.unionByName(new_versions)
    w = Window.partitionBy(*key_cols).orderBy(valid_from_col)
    valid_to = F.lead(valid_from_col).over(w)
    return hist.withColumn("valid_to", valid_to).withColumn(
        "is_current", F.col("valid_to").isNull()
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """CDC diff of two keyed snapshots: every key classified as
    'added' (new only), 'removed' (old only), 'changed' (both, any
    non-key column differs), or 'unchanged' — the reconciliation
    operator behind incremental replication, migration sign-off, and
    "what did yesterday's load actually change". Comparison is by a
    canonical per-row md5 over the non-key columns — the serialization
    is JSON (``to_json`` with nulls kept), which escapes every
    delimiter a value could contain, so no two distinct rows share a
    serialization (a separator-joined concat is ambiguous: a value
    containing the separator shifts fields and collides). Wide rows
    therefore cross the shuffle as one 32-char digest, not as
    themselves. Plan: ONE full-outer equi-join on the key — both
    sides pre-projected to (key, digest) — then a pure classification
    projection; at 100 TB that is one co-partitioned shuffle each
    side and constant-width exchange rows. Output: key columns +
    ``change_type``, consumable directly or re-aggregated.

    Caller contract (same as ``upsert``): keys are unique within each
    snapshot — with duplicates the full-outer join multiplies rows and
    the per-class counts inflate. Non-key columns must match in name
    AND type: a type migration (INT→DOUBLE) renders values differently
    and would report every row changed, so it raises instead."""
    val_cols_old = [c for c in old.columns if c not in key_cols]
    val_cols_new = [c for c in new.columns if c not in key_cols]
    if sorted(val_cols_old) != sorted(val_cols_new):
        raise ValueError("snapshot schemas differ in non-key columns")
    types_old = {f.name: f.dataType for f in old.schema if f.name in val_cols_old}
    types_new = {f.name: f.dataType for f in new.schema if f.name in val_cols_new}
    if types_old != types_new:
        raise ValueError(
            "snapshot schemas differ in non-key column TYPES: "
            + ", ".join(
                f"{c}: {types_old[c].simpleString()} vs "
                f"{types_new[c].simpleString()}"
                for c in sorted(types_old)
                if types_old[c] != types_new[c]
            )
        )

    def digested(df: DataFrame, tag: str) -> DataFrame:
        # Timestamp formats: to_json's defaults render milliseconds
        # only (sub-ms changes would collide), and TIMESTAMP vs
        # TIMESTAMP_NTZ use SEPARATE options. The zoned format keeps
        # the offset (XXX) so two instants in a DST fall-back hour
        # stay distinct under a non-UTC session timezone.
        dig = F.md5(
            F.to_json(
                F.struct(*[F.col(c) for c in sorted(val_cols_old)]),
                {
                    "ignoreNullFields": "false",
                    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSSXXX",
                    "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
                },
            )
        )
        return df.select(
            *[F.col(k) for k in key_cols], dig.alias(f"_h_{tag}")
        )

    # Null-SAFE key equality (<=>): a plain equi-join never matches
    # NULL keys, so a row whose key is NULL in both snapshots would be
    # double-reported as 'added' + 'removed'. EqualNullSafe is still a
    # hash-joinable equi-key, so the one-shuffle plan contract holds.
    do = digested(old, "old")
    for k in key_cols:
        do = do.withColumnRenamed(k, f"_ko_{k}")
    dn = digested(new, "new")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & F.col(f"_ko_{k}").eqNullSafe(F.col(k))
    j = do.join(dn, cond, "full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), "added")
        .when(F.col("_h_new").isNull(), "removed")
        .when(F.col("_h_old") != F.col("_h_new"), "changed")
        .otherwise("unchanged")
    )
    return j.select(
        *[
            F.coalesce(F.col(f"_ko_{k}"), F.col(k)).alias(k)
            for k in key_cols
        ],
        change.alias("change_type"),
    )
