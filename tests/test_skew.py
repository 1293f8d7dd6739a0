"""Skew helpers: salted join must be exactly a plain inner join."""

from __future__ import annotations

from pyspark.sql import functions as F

from supplier_performance_data_pipeline_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # 90% of fact rows hit one hot key — the shape salting exists for.
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("attr")
    )
    plain = fact.join(dim, "k").select("k", "payload", "attr")
    salted = salted_join(fact, dim, "k").select("k", "payload", "attr")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_stratified_hash_sample_rates_and_determinism(spark):
    from supplier_performance_data_pipeline_spark.operators.sampling import (
        stratified_hash_sample,
    )
    from pyspark.sql import functions as F

    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 2 == 0).cast("string").alias("s")
    )
    rates = {"true": 0.5, "false": 0.1}
    a = stratified_hash_sample(df, "id", "s", rates)
    b = stratified_hash_sample(df, "id", "s", rates)
    rows_a = sorted(map(tuple, a.collect()))
    assert rows_a == sorted(map(tuple, b.collect()))  # rerun-stable
    counts = {r["s"]: r["n"] for r in a.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["true"] / 2500 - 0.5) < 0.05
    assert abs(counts["false"] / 2500 - 0.1) < 0.05


# --- Count-Min sketch (banked for round-5 registration) ---------------------


def test_cm_estimates_never_underestimate_and_exact_when_sparse(spark):
    """The CM guarantee: est(x) >= true count ALWAYS; with n << width
    the collision probability is tiny and estimates are exact for most
    items. Verified per item against exact groupBy counts."""
    from supplier_performance_data_pipeline_spark.operators.sketch import (
        cm_cell_table,
        cm_estimates,
    )
    from pyspark.sql import functions as F

    rows = [(f"u{i % 17}",) for i in range(500)] + [("hot",)] * 300
    df = spark.createDataFrame(rows, "k string")
    cells = cm_cell_table(df, "k")
    items = df.select("k").distinct()
    est = {
        r["item"]: r["est"]
        for r in cm_estimates(cells, items, "k").collect()
    }
    exact = {
        r["k"]: r["cnt"]
        for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)  # overestimate-only
    assert est["hot"] == 300 or est["hot"] > 300  # hot key present
    # Sparse regime: the vast majority estimate exactly.
    exact_hits = sum(est[k] == exact[k] for k in exact)
    assert exact_hits >= len(exact) - 2


def test_cm_cell_tables_merge_by_cellwise_addition(spark):
    """Mergeability — the property that makes CM the distributed /
    incremental counting primitive: sketch(A union B) equals the
    cellwise sum of sketch(A) and sketch(B)."""
    from supplier_performance_data_pipeline_spark.operators.sketch import (
        cm_cell_table,
    )
    from pyspark.sql import functions as F

    a = spark.createDataFrame([(f"x{i % 5}",) for i in range(40)], "k string")
    b = spark.createDataFrame([(f"y{i % 3}",) for i in range(30)], "k string")
    whole = cm_cell_table(a.unionAll(b), "k")
    merged = (
        cm_cell_table(a, "k")
        .unionAll(cm_cell_table(b, "k"))
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    w = {(r["row"], r["pos"]): r["cnt"] for r in whole.collect()}
    m = {(r["row"], r["pos"]): r["cnt"] for r in merged.collect()}
    assert w == m


def test_cm_unseen_item_estimates_zero_or_collision(spark):
    """An item never inserted must estimate 0 unless every one of its
    depth cells collides (astronomically unlikely at this fill) — and
    never NULL."""
    from supplier_performance_data_pipeline_spark.operators.sketch import (
        cm_cell_table,
        cm_estimates,
    )

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    cells = cm_cell_table(df, "k")
    ghost = spark.createDataFrame([("never-seen",)], "k string")
    row = cm_estimates(cells, ghost, "k").collect()[0]
    assert row["est"] == 0


def test_cm_null_keys_skipped_on_both_sides(spark):
    """NULLs never enter the sketch (hashed NULLs would land in cells
    no equality probe can reach — a silent underestimate path) and
    NULL query items are dropped rather than returning est rows."""
    from supplier_performance_data_pipeline_spark.operators.sketch import (
        cm_cell_table,
        cm_estimates,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,)], "k string"
    )
    cells = cm_cell_table(df, "k")
    # Only 'a' contributes: every cell count is exactly 2.
    assert all(r["cnt"] == 2 for r in cells.collect())
    items = spark.createDataFrame([("a",), (None,)], "k string")
    est = {r["item"]: r["est"] for r in cm_estimates(cells, items, "k").collect()}
    assert est == {"a": 2}
