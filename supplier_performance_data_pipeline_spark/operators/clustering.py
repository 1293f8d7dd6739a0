"""Distributed k-means over embedding columns (Lloyd's algorithm).

Training-data pipelines cluster embeddings for curation (SemDedup-style
pruning, stratified sampling, IVF coarse quantizers). This is Lloyd's
algorithm expressed as pure DataFrame ops — no UDF, no driver-side
data, one lazy plan for a fixed iteration count — in ARRAY form:

  per iteration:
    assignment = a PROJECTION: every row scores all K centroids from a
      broadcast 1-row centroid table (the risk-bounds crossJoin shape)
      and takes array_min over (distance, cluster) structs — argmin
      with the tie-break for free, zero shuffle;
    update     = ONE hash agg keyed by cluster: 64 per-dimension
      DECIMAL sums + a count, rebuilt into centroid arrays.

  Total shuffles for I iterations: I updates + the final profile agg —
  each over K-keyed partial-aggregated rows. The earlier long-format
  design (explode to (vec_id, dim, v), join per iteration) moved N×64
  rows through ~3 exchanges per iteration; this one moves N rows
  through none and K rows through one.

Determinism contract (the DuckDB oracle reproduces every iteration
bit-for-bit):
- per-row distance is a left-to-right DOUBLE fold over dimensions
  (zip_with + aggregate) — the same fold the ANN/cosine oracles rely
  on, bit-identical to DuckDB's list_sum(list_transform(...));
- every CROSS-ROW sum is DECIMAL (exact, order-free): the per-dim
  centroid sums and the inertia sum of row distances.
Initial centroids are the first K vectors (vec_id < K).

Scale: N rows stream through whole-stage-codegen projections; the only
shuffled data is K×(64+1) aggregate cells per iteration. Centroid
tables are one broadcast row. For many iterations at 100 TB you'd
checkpoint the assignment between iterations to cut lineage; the
fixed-iteration plan here keeps the whole thing lazy.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_DEFAULT = 4
ITERS_DEFAULT = 2
DIM_DEFAULT = 64


def spread_for_fanout(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition a NARROW input to full parallelism BEFORE a
    multiplicative explode (dim^2 grids, shingle fan-outs).

    A small table is one row group -> ONE scan task, so without this the
    entire exploded workload (millions of tuples plus their per-tuple
    DECIMAL casts) runs single-threaded — measured 24s -> ~2s on the
    dim-correlation grid at sf0.1. Delegates to readers.spread_scan,
    which no-ops when the input is already at least cluster-wide: an
    unconditional repartition here would COALESCE a thousands-of-splits
    100 TB scan down to core count — the exact one-task hazard this
    helper exists to prevent, inverted. Downstream aggs are order-free
    so placement never changes results.
    """
    from supplier_performance_data_pipeline_spark.sources.readers import (
        spread_scan,
    )

    return spread_scan(df, *keys)
# Row distance (≤ dim × O(1) squares) cast to DECIMAL(24,12) before the
# cross-row inertia sum; per-dim components round to DECIMAL(20,10)
# before the centroid sums.
DIST_DEC = "decimal(24,12)"
COMP_DEC = "decimal(20,10)"

# Left-to-right double fold — mirrors the oracle's list_sum exactly.
_DIST_SQL = (
    "aggregate(zip_with(v, {cv}, (x, y) -> (x - y) * (x - y)), "
    "0.0D, (acc, x) -> acc + x)"
)


def _assign(base: DataFrame, cents_1row: DataFrame) -> DataFrame:
    """Nearest-centroid assignment as a projection: (vec_id, v, cluster, d).

    ``cents_1row`` is a single row holding array<struct<cluster, cv>>;
    broadcast-crossJoined onto every vector row (never a cartesian —
    the same 1-row broadcast shape as the risk bounds). argmin is
    array_min over (d, cluster) structs: lexicographic struct ordering
    gives the lowest-cluster tie-break for free.
    """
    with_c = base.crossJoin(F.broadcast(cents_1row))
    m = F.expr(
        "array_min(transform(cents, s -> struct("
        + _DIST_SQL.format(cv="s.cv")
        + " AS d, s.cluster AS cluster)))"
    )
    return with_c.select(
        "vec_id", "v", m["cluster"].alias("cluster"), m["d"].alias("d")
    )


def _update(assigned: DataFrame, dim: int) -> DataFrame:
    """Centroid update: ONE cluster-keyed agg of 64 exact DECIMAL sums
    (order-free) + count, divided back into a double centroid array.
    expr strings, not Column loops — 64 aggregates as Column-API calls
    cost a py4j round trip each at plan-build time."""
    upd = assigned.groupBy("cluster").agg(
        F.expr("count(*) AS cnt"),
        *[
            F.expr(f"sum(cast(v[{i}] AS {COMP_DEC})) AS s{i}")
            for i in range(dim)
        ],
    )
    cv = "array(" + ", ".join(f"double(s{i}) / cnt" for i in range(dim)) + ")"
    return upd.select("cluster", F.expr(cv).alias("cv"))


def _to_1row(cent: DataFrame) -> DataFrame:
    """Collapse the K-row centroid table to one broadcastable row.
    collect_list order is nondeterministic and irrelevant: array_min
    in the assignment is commutative over the struct array."""
    return cent.groupBy().agg(
        F.collect_list(F.struct("cluster", "cv")).alias("cents")
    )


# --- fused multi-subspace Lloyd's (r13 optimization) -------------------------
#
# PQ trains m independent k-means, one per subspace. Expressed as m
# separate lazy chains (the r5-r12 shape) each chain contributes
# iters x (update agg + centroid collapse + broadcast) AQE stages to
# the final plan, and every consumer of a chain's centroids (the
# full-table encode, the query LUT, the persisted centroid table)
# re-embeds — and re-EXECUTES — the whole chain. At sf0.1 the r13
# profile measured the IVF-PQ queries at 58-249 Spark jobs apiece,
# nearly all 1-task stages: pure scheduler overhead (guide §1/§2.4).
#
# The fused form keys ONE chain by (sub, cluster) over the exploded
# (vec_id, sub, subvector) table: per iteration exactly one
# (sub, cluster)-keyed update agg, one per-sub centroid collapse and
# one broadcast — m x fewer exchanges, and the trained (sub, cluster,
# cv) table is tiny (m*k rows) so callers localCheckpoint it once and
# every downstream read is free. Per-subspace arithmetic is
# BIT-IDENTICAL to the m-chain form: the same rows fold through the
# same left-to-right double distance and the same per-(sub, cluster)
# DECIMAL sums — grouping by an extra key changes neither membership
# nor order-free DECIMAL addition, and seeding selects the same k
# rows per sub (proven by the unchanged DuckDB oracles of all eight
# registered IVF-PQ queries).


def _run_concurrent(*thunks):
    """Run independent eager Spark workloads (localCheckpoint /
    write jobs) from concurrent driver threads — guide §2.6: actions
    are only sequential because driver code calls them sequentially,
    and these tiny-stage training chains leave the cluster idle while
    the scheduler round-trips. Exceptions propagate; results return in
    the thunks' order, so determinism is untouched."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return (thunks[0](),)
    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(t) for t in thunks]
        return tuple(f.result() for f in futures)


def _decoded_base(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Decode the vector column to double arrays and materialize ONCE,
    SPREAD to cluster parallelism first (r13): the local fixtures scan
    as one parquet split, so without the spread every downstream
    argmin projection (interpreted higher-order functions) and every
    DECIMAL(20,10) centroid sum (BigDecimal-backed above 18 digits)
    runs single-threaded — measured ~0.3 s per stage at sf0.1.
    ``spread_for_fanout`` is a no-op on a scan that is already at
    least cluster-wide, so at 100 TB this adds nothing."""
    spread = spread_for_fanout(
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_e")),
        "vec_id",
    )
    return spread.select(
        "vec_id", F.expr("transform(_e, x -> double(x))").alias("v")
    ).localCheckpoint()


def _explode_subs(
    df: DataFrame, m: int, d_sub: int, id_col: str = "vec_id"
) -> DataFrame:
    """(id, v) -> (id, sub, v): one row per PQ subspace, v sliced to
    that subspace — the long-format input of the fused Lloyd's."""
    return df.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("sub"),
                        F.slice(
                            F.col("v"), s * d_sub + 1, d_sub
                        ).alias("v"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("sv"),
    ).select(id_col, F.col("sv.sub").alias("sub"), F.col("sv.v").alias("v"))


def _to_persub(cent: DataFrame) -> DataFrame:
    """(sub, cluster, cv) -> (sub, cents): per-sub broadcastable
    centroid arrays — the multi-subspace twin of ``_to_1row``."""
    return cent.groupBy("sub").agg(
        F.collect_list(F.struct("cluster", "cv")).alias("cents")
    )


def _assign_multi(base_sub: DataFrame, cents_persub: DataFrame) -> DataFrame:
    """Nearest-centroid assignment per (row, sub): broadcast equi-join
    on ``sub`` (each row sees only its own subspace's codebook), then
    the same argmin-over-structs projection as ``_assign``."""
    with_c = base_sub.join(F.broadcast(cents_persub), "sub")
    mexp = F.expr(
        "array_min(transform(cents, s -> struct("
        + _DIST_SQL.format(cv="s.cv")
        + " AS d, s.cluster AS cluster)))"
    )
    return with_c.select(
        "vec_id",
        "sub",
        "v",
        mexp["cluster"].alias("cluster"),
        mexp["d"].alias("d"),
    )


def _update_multi(assigned: DataFrame, dim: int) -> DataFrame:
    """Centroid update keyed by (sub, cluster): ONE hash agg for all m
    subspaces — the same per-group DECIMAL sums as ``_update``."""
    upd = assigned.groupBy("sub", "cluster").agg(
        F.expr("count(*) AS cnt"),
        *[
            F.expr(f"sum(cast(v[{i}] AS {COMP_DEC})) AS s{i}")
            for i in range(dim)
        ],
    )
    cv = "array(" + ", ".join(f"double(s{i}) / cnt" for i in range(dim)) + ")"
    return upd.select("sub", "cluster", F.expr(cv).alias("cv"))


def _lloyd_multi_cents(
    base_sub: DataFrame, k: int, iters: int, dim: int, seed: str = "first"
) -> DataFrame:
    """Fused Lloyd training over (vec_id, sub, v): final (sub, cluster,
    cv) after ``iters`` update rounds. ``seed="first"`` takes vec_id <
    k per sub with cluster = vec_id (the ``_lloyd_with_cents``
    contract); ``seed="rank"`` takes the k lowest vec_ids per sub
    renumbered 0..k-1 (the ``_lloyd_train_cents`` contract — a
    PARTITIONED window here, since each sub sees the same id set)."""
    if seed == "first":
        cent = base_sub.filter(F.col("vec_id") < k).select(
            "sub", F.col("vec_id").alias("cluster"), F.col("v").alias("cv")
        )
    else:
        from pyspark.sql.window import Window

        w = Window.partitionBy("sub").orderBy("vec_id")
        cent = (
            base_sub.select("sub", "v", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= k)
            .select(
                "sub",
                (F.col("rn") - 1).alias("cluster"),
                F.col("v").alias("cv"),
            )
        )
    for _ in range(iters):
        cent = _update_multi(_assign_multi(base_sub, _to_persub(cent)), dim)
    return cent


def kmeans_assignments(
    emb: DataFrame,
    k: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM_DEFAULT,
) -> DataFrame:
    """Final (vec_id, cluster, d) after ``iters`` Lloyd iterations;
    ``d`` is the double squared distance to the winning centroid."""
    # The vector table feeds the assignment of every iteration;
    # materialize the decoded double arrays once (localCheckpoint, not
    # persist: same in-memory reuse, but the checkpointed RDD is
    # GC-cleaned when the plan is dropped instead of occupying the cache
    # manager until someone remembers to unpersist).
    base = _decoded_base(emb, id_col, vec_col)
    return _lloyd_from_base(base, k, iters, dim)


def _lloyd_from_base(base: DataFrame, k: int, iters: int, dim: int) -> DataFrame:
    """Lloyd iterations over an already-decoded (vec_id, v) table —
    shared by ``kmeans_assignments`` (which checkpoints the decode) and
    ``pq_encode`` (which checkpoints ONCE and slices lazily per
    subspace, instead of paying one eager decode job per subspace)."""
    return _lloyd_with_cents(base, k, iters, dim)[0]


def _lloyd_with_cents(
    base: DataFrame, k: int, iters: int, dim: int
) -> tuple[DataFrame, DataFrame]:
    """Lloyd iterations returning BOTH the final assignment table and
    the final centroid table (cluster, cv) — ADC queries need the
    codebook itself, not just each vector's code."""
    cent = base.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("cv")
    )
    assign = _assign(base, _to_1row(cent))
    for _ in range(iters):
        cent = _update(assign, dim)
        assign = _assign(base, _to_1row(cent))
    return assign, cent


def kmeans_cluster_profile(
    emb: DataFrame,
    k: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM_DEFAULT,
) -> DataFrame:
    """(cluster, n_vectors, inertia): cluster sizes and within-cluster
    sum of squared distances — row distances cast to DECIMAL before the
    cross-row sum so the reduction is order-free, rounded for display."""
    assign = kmeans_assignments(emb, k, iters, id_col, vec_col, dim)
    return assign.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        F.round(
            F.sum(F.col("d").cast(DIST_DEC)).cast("double"), 6
        ).alias("inertia"),
    )


def pq_encode(
    emb: DataFrame,
    dim: int = DIM_DEFAULT,
    m: int = 4,
    k: int = 16,
    iters: int = ITERS_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization (Jégou et al., PAMI '11): split each
    vector into ``m`` subvectors of dim/m, k-means each subspace
    independently (the SAME deterministic Lloyd's above — first-k
    seeding, DECIMAL-exact updates, so codes are reproducible across
    engines and partitionings), and encode every vector as its m
    nearest-subcentroid ids — dim floats compress to m small ints
    (16x-64x), and asymmetric distance queries scan codes instead of
    vectors. The compression step of an IVF-PQ index; the IVF coarse
    half is ``ann_ivf_topk``'s quantizer.

    Output: (vec_id, codes array<int> length m, distortion = rounded
    double sum of the m subspace squared distances — the
    reconstruction error of the codeword).

    Plan: the full vectors decode and localCheckpoint ONCE (one eager
    job — calling kmeans_assignments per subspace would instead pay m
    sequential decode-and-checkpoint jobs, each re-scanning the
    source); every subspace then slices that materialized base with a
    lazy projection and runs Lloyd's I aggregate rounds; the m
    assignment tables (vec-sized, 3 columns) union and fold back to
    one row per vector with a single vec_id-keyed aggregate."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    base = _decoded_base(emb, id_col, vec_col)
    # Fused multi-subspace Lloyd's (r13): one (sub, cluster)-keyed
    # chain over the exploded table instead of m separate chains —
    # identical per-subspace arithmetic, m x fewer exchanges.
    bsub = _explode_subs(base, m, d_sub)
    cent = _lloyd_multi_cents(bsub, k, iters, d_sub, seed="first")
    allsub = _assign_multi(bsub, _to_persub(cent)).select(
        "vec_id",
        "sub",
        F.col("cluster").cast("int").alias("code"),
        F.col("d").cast(DIST_DEC).alias("d"),
    )
    return allsub.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("sub"), F.col("code")))
            ),
            lambda c: c["code"],
        ).alias("codes"),
        F.round(F.sum("d").cast("double"), 6).alias("distortion"),
    )


def _lloyd_train_cents(
    samp: DataFrame, k: int, iters: int, dim: int
) -> DataFrame:
    """Train-only Lloyd's: final (cluster, cv) centroid table from a
    (vec_id, v) TRAINING SET, never assigning anything outside it.

    Seeds are the k lowest-vec_id training rows renumbered 0..k-1 (the
    sampled twin of the first-k seeding above — "first k of the sample"
    stays deterministic under any sample predicate). ``iters`` update
    rounds; the caller freezes the returned centroids and encodes the
    full table as a broadcast-argmin projection."""
    from pyspark.sql.window import Window

    w = Window.orderBy("vec_id")
    cent = (
        samp.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).alias("cluster"),
            F.col("v").alias("cv"),
        )
    )
    for _ in range(iters):
        cent = _update(_assign(samp, _to_1row(cent)), dim)
    return cent


def ivfpq_adc_topk_sampled(
    emb: DataFrame,
    sample_salt: str = "ivfpq-smp|",
    sample_mod: int = 10000,
    sample_thr: int = 2500,
    n_queries: int = 8,
    topk: int = 5,
    m: int = 4,
    k_pq: int = 16,
    k_coarse: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    dim: int = DIM_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """IVF-PQ with CODEBOOKS TRAINED ON A HASH SAMPLE — the actual
    100 TB deployment shape ``ivfpq_adc_topk``'s docstring promises:
    both quantizers run Lloyd's only on the deterministic md5 sample
    (sample_thr/sample_mod of rows), and the full table is touched by
    exactly three kinds of work, none of them k-means:

      1. coarse ENCODING — one broadcast-argmin projection of every
         vector against the frozen k_coarse centroids;
      2. PQ ENCODING — m broadcast-argmin projections against the
         frozen subspace codebooks;
      3. the ADC candidate join itself (codes ⋈ broadcast LUT).

    Centroid-update aggregations therefore see only sample-sized
    inputs; at 100 TB the training chain is a rounding error and the
    full-table cost is the same single encode+join pass a production
    index build pays. Training determinism: seeds are the k lowest
    vec_ids IN THE SAMPLE renumbered 0..k-1; everything downstream is
    the engine's standard deterministic Lloyd's/ADC contract, so the
    DuckDB oracle unrolls the identical sampled chain."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    from supplier_performance_data_pipeline_spark.operators.sampling import (
        md5_mod,
    )

    d_sub = dim // m
    base = _decoded_base(emb, id_col, vec_col)
    samp = base.filter(
        md5_mod(F.col("vec_id"), sample_salt, sample_mod) < sample_thr
    )
    # localCheckpoint the trained coarse codebook (k_coarse rows): it
    # feeds the full-table encode AND the multiprobe query ranking —
    # without it each consumer re-executes the whole training chain
    # (r13 profile: the chains, not the data, were the cost). The
    # coarse arm (train + frozen full-table encode) and the fused PQ
    # training are independent: concurrent driver threads (guide §2.6).
    def _coarse_arm():
        cc = _lloyd_train_cents(samp, k_coarse, iters, dim).localCheckpoint()
        # Frozen-codebook encode of the FULL table: a projection, not
        # a training pass. localCheckpoint: it feeds both IVF join
        # sides.
        enc = (
            _assign(base, _to_1row(cc))
            .select("vec_id", "cluster")
            .localCheckpoint()
        )
        return cc, enc

    samp_sub = _explode_subs(samp, m, d_sub)
    (coarse_cent, coarse), cent = _run_concurrent(
        _coarse_arm,
        lambda: _lloyd_multi_cents(
            samp_sub, k_pq, iters, d_sub, seed="rank"
        ).localCheckpoint(),
    )
    qbase = base.filter(F.col("vec_id") < n_queries)
    if n_probe <= 1:
        qc = coarse.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("cluster").alias("qcl")
        )
    else:
        from pyspark.sql.window import Window as _W

        qd = qbase.crossJoin(F.broadcast(coarse_cent)).select(
            F.col("vec_id").alias("query_id"),
            "cluster",
            F.expr(_DIST_SQL.format(cv="cv")).alias("d"),
        )
        wp = _W.partitionBy("query_id").orderBy("d", "cluster")
        qc = (
            qd.withColumn("rn", F.row_number().over(wp))
            .filter(F.col("rn") <= n_probe)
            .select("query_id", F.col("cluster").alias("qcl"))
        )
    cand = (
        qc.join(coarse, F.col("qcl") == F.col("cluster"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    lut_pd = F.expr(
        "aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)), "
        "0.0D, (acc, x) -> acc + x)"
    )
    # Fused multi-subspace path (r13): the (sub, cluster)-keyed PQ
    # codebook trained above (seed = k lowest sample ids per sub,
    # renumbered — the `_lloyd_train_cents` contract) drives the
    # full-table PQ encode and the LUT as single equi-joins.
    codes = _assign_multi(_explode_subs(base, m, d_sub), _to_persub(cent)).select(
        "vec_id", "sub", F.col("cluster").alias("code")
    )
    qsub = _explode_subs(
        qbase.select(F.col("vec_id").alias("query_id"), "v"),
        m,
        d_sub,
        id_col="query_id",
    ).withColumnRenamed("v", "qv")
    lut = qsub.join(cent, "sub").select(
        "query_id", "sub", F.col("cluster").alias("code"), lut_pd.alias("pd")
    )
    allp = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .select("query_id", "vec_id", F.col("pd").cast(DIST_DEC).alias("pd"))
    )
    adc = allp.groupBy("query_id", "vec_id").agg(F.sum("pd").alias("adc"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("adc").cast("double"), 6).alias("adc_dist"),
        )
    )


def _subspace_code_expr(cents_col: str, off: int, d_sub: int) -> F.Column:
    """Nearest-subcentroid id for v[off+1 .. off+d_sub] against a
    broadcast centroid array column — the same argmin-over-structs
    shape as ``_assign``, inlined so ALL subspace codes (and the
    coarse code) come out of ONE projection instead of m joins."""
    return F.expr(
        f"array_min(transform({cents_col}, c -> struct("
        f"aggregate(zip_with(slice(v, {off + 1}, {d_sub}), c.cv, "
        "(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x) AS d, "
        "c.cluster AS cluster)))"
    )["cluster"]


def ivfpq_index_write(
    emb: DataFrame,
    path: str,
    sample_salt: str = "ivfpq-smp|",
    sample_mod: int = 10000,
    sample_thr: int = 2500,
    m: int = 4,
    k_pq: int = 16,
    k_coarse: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    dim: int = DIM_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train: DataFrame | None = None,
) -> None:
    """BUILD + PERSIST an IVF-PQ index as three Parquet tables — the
    serving layout a production ANN system stores and reloads:

      <path>/codes             (vec_id, coarse, c0..c{{m-1}})
      <path>/coarse_centroids  (cluster, cv array<double>)
      <path>/pq_centroids      (sub, cluster, cv array<double>)

    Codebooks train on the deterministic md5 sample (frozen, same
    contract as ``ivfpq_adc_topk_sampled``); the full table is then
    encoded in ONE broadcast-argmin projection producing the coarse
    code and all m PQ codes per row — zero shuffles on the vector
    table, and the codes table is the only full-size artifact
    (m+1 small ints per vector: the 16-64x compressed layout that
    makes a billion-vector index fit an object store). Per-subspace
    codes land as SEPARATE int columns so a serving scan can prune to
    exactly the columns ADC touches.

    ``train`` (optional) overrides the training set: codebooks train
    on THIS frame (same ``id_col``/``vec_col`` shape) instead of the
    md5 sample of ``emb`` — the production shape for curated or
    recency-weighted retrains (``ann_codebook_retrain_trigger``
    trains its candidate on base-sample + the full drifted batch);
    encoding still covers all of ``emb``."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    from supplier_performance_data_pipeline_spark.operators.sampling import (
        md5_mod,
    )
    from supplier_performance_data_pipeline_spark.sources.writers import (
        write_parquet,
    )

    d_sub = dim // m
    base = _decoded_base(emb, id_col, vec_col)
    if train is not None:
        samp = _decoded_base(train, id_col, vec_col)
    else:
        samp = base.filter(
            md5_mod(F.col("vec_id"), sample_salt, sample_mod) < sample_thr
        )
    # r13: train ONCE, serve many — the coarse codebook and the fused
    # (sub, cluster)-keyed PQ codebook both localCheckpoint (k_coarse
    # and m*k_pq rows), so the codes encode, the centroid-table writes
    # and nothing downstream ever re-executes a training chain (the
    # r5-r12 lazy form executed each of the 5 chains twice: once under
    # the codes write's broadcasts, once for its centroid-table write).
    # The two trainings are independent, so they run as CONCURRENT
    # driver-thread jobs (guide §2.6): each chain's stages are mostly
    # 1-task scheduler latency, and overlapping them hides one chain
    # behind the other. Results are unaffected — each chain's output
    # is a deterministic function of its own input.
    coarse_cent, pq_cent = _run_concurrent(
        lambda: _lloyd_train_cents(
            samp, k_coarse, iters, dim
        ).localCheckpoint(),
        lambda: _lloyd_multi_cents(
            _explode_subs(samp, m, d_sub), k_pq, iters, d_sub, seed="rank"
        ).localCheckpoint(),
    )
    # All m per-sub 1-row centroid arrays come out of ONE aggregate of
    # the checkpointed codebook (collect_list skips the non-matching
    # subs' NULLs) instead of m filtered scans + broadcasts.
    pq_1row = pq_cent.groupBy().agg(
        *[
            F.collect_list(
                F.when(F.col("sub") == s, F.struct("cluster", "cv"))
            ).alias(f"ce{s}")
            for s in range(m)
        ]
    )
    enc = base.crossJoin(
        F.broadcast(_to_1row(coarse_cent).withColumnRenamed("cents", "co"))
    ).crossJoin(F.broadcast(pq_1row))
    codes = enc.select(
        "vec_id",
        _subspace_code_expr("co", 0, dim).cast("int").alias("coarse"),
        *[
            _subspace_code_expr(f"ce{s}", s * d_sub, d_sub)
            .cast("int")
            .alias(f"c{s}")
            for s in range(m)
        ],
    )
    # Output file sizing (guide §6): the encode runs wide (spread
    # base), so an AQE rebalance before the write coalesces the tiny
    # local output to one file — and at 100 TB caps files at the
    # advisory partition size instead of one-per-task.
    write_parquet(codes.hint("rebalance"), os.path.join(path, "codes"))
    write_parquet(coarse_cent, os.path.join(path, "coarse_centroids"))
    write_parquet(
        pq_cent.select("sub", "cluster", "cv"),
        os.path.join(path, "pq_centroids"),
    )
    # A rebuild over an existing index CARRIES the name counter forward
    # (max_seq from the old manifest, version chained): a compact after
    # the rebuild must not re-mint a generation name the previous
    # build's compaction left orphaned on disk. The base "codes" table
    # itself is overwritten by design — a full rebuild is a declared
    # teardown (S4 overwrite idempotency), unlike append/compact which
    # stay reader-safe.
    prev = _load_manifest(emb.sparkSession, path)
    _write_segment_manifest(
        emb.sparkSession,
        path,
        ["codes"],
        max_seq=prev["max_seq"],
        prev_version=prev["version"],
    )


SEGMENT_MANIFEST = "segments_manifest"  # legacy parquet layout (read-only)
MANIFEST_DIR = "_segments"  # versioned JSON manifest log (r11 ADVICE)
_MANIFEST_FILE_RE = re.compile(r"manifest-(\d{10})\.json")
_SEG_NAME_RE = re.compile(r"[A-Za-z0-9_.\-]+")
# Names this index's own writers mint — the ONLY names GC may reclaim.
_SEG_SCHEME_RE = re.compile(r"codes(?:_(?:seg|g)(\d+))?")


def _hadoop_fs(spark, p: str):
    """(FileSystem, Path, jvm) for ``p`` via the public Hadoop FS API —
    works on any Spark-supported filesystem (local, HDFS, object
    stores), all driver-side, no Spark job."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(p)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def _seg_seq(name: str) -> int:
    """The sequence number a scheme-minted segment name encodes
    ("codes" -> 0); 0 for foreign (caller-supplied) names."""
    m = _SEG_SCHEME_RE.fullmatch(name)
    return int(m.group(1)) if m and m.group(1) else 0


def _load_manifest(spark, path: str) -> dict:
    """The index's manifest: ``{"version", "max_seq", "segments"}``.

    The manifest is the single source of truth for WHICH code tables
    make up the index — serving that enumerates segments by convention
    instead silently drops appended vectors (the r10 ADVICE data-loss
    class). Layout is a ``_delta_log``-style versioned JSON sidecar:
    ``_segments/manifest-<version>.json``, each version written whole
    to a temp name then renamed, so a reader NEVER observes a partial
    manifest and a reader racing a writer sees either the old complete
    version or the new one (r11 ADVICE: the previous parquet
    mode("overwrite") deleted old files before new ones landed). It is
    ops metadata, not data: read driver-side in milliseconds, no Spark
    job (the previous parquet read+rewrite cost a full job cycle per
    append — the r11 INTENDED_PLAN_TRADES residual).

    ``max_seq`` is a monotonic counter over every segment name ever
    minted — names are NEVER reused, even after compaction drops them
    from the manifest, so an orphaned pre-compaction directory can
    never be reborn as a live segment (r11 ADVICE overwrite race).

    Fallbacks are NARROW — existence-checked, never exception-blanket,
    so a transient IO error on a real manifest raises instead of
    silently serving a truncated index: no JSON log -> the legacy
    parquet manifest (r10/r11 layout) if present -> else the bare
    pre-manifest ``codes`` layout."""
    fs, mdir, jvm = _hadoop_fs(spark, os.path.join(path, MANIFEST_DIR))
    if fs.exists(mdir):
        best = None
        for st in fs.listStatus(mdir):
            m = _MANIFEST_FILE_RE.fullmatch(st.getPath().getName())
            if m and (best is None or int(m.group(1)) > best[0]):
                best = (int(m.group(1)), st.getPath())
        if best is not None:
            stream = fs.open(best[1])
            try:
                raw = bytes(
                    jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                )
            finally:
                stream.close()
            man = json.loads(raw)
            return {
                "version": best[0],
                "max_seq": int(man["max_seq"]),
                "segments": list(man["segments"]),
            }
    lfs, lpath, _ = _hadoop_fs(spark, os.path.join(path, SEGMENT_MANIFEST))
    if lfs.exists(lpath):
        rows = spark.read.parquet(
            os.path.join(path, SEGMENT_MANIFEST)
        ).collect()
        segs = [r.segment for r in sorted(rows, key=lambda r: r.seq)]
        # max_seq reconstruction must cover ORPHANS, not just live
        # entries (r12 ADVICE): a legacy (parquet-manifest) index whose
        # compact dropped codes_segNNNN entries leaves those dirs on
        # disk with seq numbers above every live entry's — deriving the
        # counter from live entries alone would re-mint an orphan's
        # name on the next append and overwrite a directory a
        # pre-compaction reader may still be scanning. Scan the index
        # root for scheme-matching directories so the counter clears
        # everything either generation of writers ever minted.
        max_seq = max((_seg_seq(s) for s in segs), default=0)
        rfs, rpath, _ = _hadoop_fs(spark, path)
        for st in rfs.listStatus(rpath):
            name = st.getPath().getName()
            if st.isDirectory() and _SEG_SCHEME_RE.fullmatch(name):
                max_seq = max(max_seq, _seg_seq(name))
        return {
            "version": 0,
            "max_seq": max_seq,
            "segments": segs,
        }
    return {"version": 0, "max_seq": 0, "segments": ["codes"]}


def _read_segment_manifest(spark, path: str) -> list[str]:
    """The index's segment list, in landing order (see
    ``_load_manifest`` for the layout and atomicity contract)."""
    return _load_manifest(spark, path)["segments"]


def _write_segment_manifest(
    spark,
    path: str,
    segments: list[str],
    max_seq: int | None = None,
    prev_version: int | None = None,
) -> None:
    """Publish a new manifest version atomically FOR READERS: write
    the complete JSON to a writer-unique dot-temp name, then rename
    into ``_segments/manifest-<prev+1>.json`` — a reader never
    observes a partial manifest (it sees the old complete version or
    the new one).

    Writer-vs-writer conflict detection is BEST-EFFORT, not a lock
    (r12 ADVICE: Hadoop's RawLocalFileSystem delegates rename to
    POSIX rename(2), which silently REPLACES an existing destination,
    so the rename return value alone cannot detect a lost race):
    (a) an existence pre-check on the destination catches the common
    stale-read case — two writers derived the same next version from
    the same ``_load_manifest`` snapshot — before any bytes move;
    (b) after the rename, the destination is read back and compared
    to the bytes this writer staged; a mismatch means a racing writer
    replaced the version under us, and we raise rather than report a
    commit that did not land (the loser detects, the winner's
    complete manifest serves). Single-writer remains the supported
    ops model; these checks turn a silent lost update into a raised
    one. On S3-like stores, front the log with a putIfAbsent-capable
    commit service as Delta does for a real mutual exclusion."""
    for s in segments:
        if not _SEG_NAME_RE.fullmatch(s):
            raise ValueError(f"invalid segment name {s!r}")
    if max_seq is None:
        max_seq = max((_seg_seq(s) for s in segments), default=0)
    if prev_version is None:
        prev_version = _load_manifest(spark, path)["version"]
    version = prev_version + 1
    mdir = os.path.join(path, MANIFEST_DIR)
    fs, final, jvm = _hadoop_fs(
        spark, os.path.join(mdir, f"manifest-{version:010d}.json")
    )
    # Writer-unique temp name: two racing writers must not stage into
    # the SAME dot-temp (fs.create overwrite=True would interleave
    # their bytes); uuid4 keeps staging files disjoint per writer.
    _, tmp, _ = _hadoop_fs(
        spark,
        os.path.join(
            mdir, f".manifest-{version:010d}.{uuid.uuid4().hex}.json.tmp"
        ),
    )
    data = json.dumps(
        {"version": version, "max_seq": max_seq, "segments": segments}
    ).encode()
    if fs.exists(final):
        raise RuntimeError(
            f"manifest version {version} already exists at {mdir} — "
            "concurrent writer detected; retry from a fresh read"
        )
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    if not fs.rename(tmp, final):
        fs.delete(tmp, False)
        raise RuntimeError(
            f"manifest version {version} already exists at {mdir} — "
            "concurrent writer detected; retry from a fresh read"
        )
    # Version-guard read-back (r12 VERDICT #4): on filesystems whose
    # rename replaces silently, confirm OUR bytes are what landed.
    stream = fs.open(final)
    try:
        landed = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    if landed != data:
        raise RuntimeError(
            f"manifest version {version} at {mdir} was replaced by a "
            "concurrent writer after this writer's rename (lost-update "
            "race) — this commit did NOT land; retry from a fresh read"
        )


def ivfpq_index_append(
    new_emb: DataFrame,
    path: str,
    m: int = 4,
    dim: int = DIM_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    segment: str | None = None,
) -> str:
    """INCREMENTAL ingest into a persisted IVF-PQ index — the ANN leg
    of the round-10 incremental-maintenance triad (components,
    profile, vectors): when a batch of new embeddings lands, the
    stored codebooks are FROZEN, so ingest is encode-only — one
    broadcast-argmin projection over the BATCH (coarse code + m PQ
    codes per row, the same single-projection shape as the full
    build), written as a separate code SEGMENT next to the base
    ``codes`` table. No retraining, no touch of the existing codes:
    per-ingest cost is O(batch), not O(index), which is what keeps a
    continuously-growing vector corpus affordable — and because codes
    are a pure per-row function of the frozen codebooks, the union of
    segments is BIT-IDENTICAL to what a from-scratch full encode
    would store (the registered replay proves it against the
    full-build oracle). Segments are the standard LSM-ish layout;
    ``ivfpq_index_compact`` folds them back into one generation when
    the fan-out grows. The codebook-drift question — when enough
    distribution shift accumulates that frozen codebooks hurt recall —
    is the retrain trigger: ``ann_codebook_retrain_trigger`` emits the
    decision row and ``ann_ivfpq_recall_audit`` is the standing dial.

    Segment identity is MANIFEST-tracked (r10 ADVICE): with
    ``segment=None`` (default) a fresh ``codes_seg{NNNN}`` name is
    derived from the manifest, so a second append can never overwrite
    the first's codes; an explicit name already present in the
    manifest raises instead of silently clobbering. The manifest is
    rewritten with the new segment appended, and manifest-default
    serving (``ivfpq_adc_from_index(segments=None)``) picks it up
    without the caller enumerating anything. Returns the segment name
    actually written."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    from supplier_performance_data_pipeline_spark.sources.writers import (
        write_parquet,
    )

    spark = new_emb.sparkSession
    man = _load_manifest(spark, path)
    segs = man["segments"]
    if segment is None:
        # Monotonic counter, NOT first-free-slot: after compaction drops
        # codes_seg0000 from the manifest but leaves its directory for
        # GC, a first-free scan would re-mint that name and overwrite a
        # directory a pre-compaction reader may still be scanning (r11
        # ADVICE). max_seq only ever grows, so names are never reborn.
        seq = man["max_seq"] + 1
        segment = f"codes_seg{seq:04d}"
        new_max = seq
    else:
        if segment in segs:
            raise ValueError(
                f"segment {segment!r} already exists in the index manifest "
                f"at {path} — appending would overwrite its codes; pass a "
                "fresh name or let segment=None derive one"
            )
        sfs, spath, _ = _hadoop_fs(spark, os.path.join(path, segment))
        if sfs.exists(spath):
            raise ValueError(
                f"segment directory {segment!r} exists on disk at {path} "
                "but is not in the manifest (orphaned / pre-compaction) — "
                "writing over it would race readers holding the old "
                "manifest; pass a fresh name or let segment=None derive one"
            )
        new_max = max(man["max_seq"], _seg_seq(segment))
    d_sub = dim // m
    co_cent = spark.read.parquet(os.path.join(path, "coarse_centroids"))
    pq_cent = spark.read.parquet(os.path.join(path, "pq_centroids"))
    base = new_emb.select(
        F.col(id_col).alias("vec_id"),
        F.expr(f"transform({vec_col}, x -> double(x))").alias("v"),
    )
    # r13: one aggregate of the stored codebook builds ALL m per-sub
    # 1-row centroid arrays (collect_list skips non-matching subs'
    # NULLs) — one scan + one broadcast instead of m of each.
    pq_1row = pq_cent.groupBy().agg(
        *[
            F.collect_list(
                F.when(F.col("sub") == s, F.struct("cluster", "cv"))
            ).alias(f"ce{s}")
            for s in range(m)
        ]
    )
    enc = base.crossJoin(
        F.broadcast(_to_1row(co_cent).withColumnRenamed("cents", "co"))
    ).crossJoin(F.broadcast(pq_1row))
    codes = enc.select(
        "vec_id",
        _subspace_code_expr("co", 0, dim).cast("int").alias("coarse"),
        *[
            _subspace_code_expr(f"ce{s}", s * d_sub, d_sub)
            .cast("int")
            .alias(f"c{s}")
            for s in range(m)
        ],
    )
    # AQE rebalance before the write: batch-sized segment, sized files.
    write_parquet(codes.hint("rebalance"), os.path.join(path, segment))
    _write_segment_manifest(
        spark,
        path,
        segs + [segment],
        max_seq=new_max,
        prev_version=man["version"],
    )
    return segment


def ivfpq_index_compact(spark, path: str) -> str:
    """COMPACTION for the LSM-ish segment layout (r10 VERDICT #3):
    rewrite every manifest segment's codes into ONE new-generation
    table and swap the manifest to it. After N appends the serving
    union fans out over N scans and per-segment parquet footer
    pruning degrades; compaction restores the single-table layout.

    Codes are NEVER recomputed — the rewrite is a pure scan+union+
    write of the (vec_id, coarse, c0..cm) small-int columns, so
    serving from the compacted generation is BIT-EQUAL to serving the
    segment union by the same frozen-codebook argument as the append
    path (the registered ``ann_index_compaction`` replay proves it
    against the full-build oracle). Cost is O(index-rewrite) — m+1
    small ints per vector, the compressed layout, NOT the raw vectors
    — paid once and amortized over all the appends it folds.

    Swap order is crash-safe for readers: the new generation is fully
    written BEFORE the manifest flips to it; a reader that raced the
    flip still sees the complete old segment list. Old segment dirs
    are left on disk for ``ivfpq_index_gc`` — deleting data files
    inline would race in-flight scans, and monotonic naming guarantees
    they can never be reborn as live segments in the meantime. Returns
    the new generation's segment name."""
    man = _load_manifest(spark, path)
    segs = man["segments"]
    if len(segs) == 1:
        return segs[0]
    from supplier_performance_data_pipeline_spark.sources.writers import (
        write_parquet,
    )

    # Generation name from the same monotonic counter as appends —
    # never reuses a name a prior generation or segment ever held.
    seq = man["max_seq"] + 1
    gen = f"codes_g{seq:04d}"
    codes = spark.read.parquet(os.path.join(path, segs[0]))
    for seg in segs[1:]:
        codes = codes.unionByName(spark.read.parquet(os.path.join(path, seg)))
    # AQE rebalance: the new generation lands as sized files instead
    # of one file per input segment split (guide §6).
    write_parquet(codes.hint("rebalance"), os.path.join(path, gen))
    _write_segment_manifest(
        spark, path, [gen], max_seq=seq, prev_version=man["version"]
    )
    return gen


def ivfpq_index_gc(
    spark,
    path: str,
    keep_versions: int = 1,
    min_age_sec: float = 0.0,
) -> list[str]:
    """Reclaim the index's superseded storage (r11 VERDICT #6 — the
    compact-then-leave-dirs layout is an unbounded disk leak at ops
    scale): delete (a) code-table directories matching the index's own
    naming scheme (``codes`` / ``codes_segNNNN`` / ``codes_gNNNN``)
    that no RETAINED manifest version references, (b) manifest JSON
    versions older than the retained window, and (c) the legacy
    parquet manifest once a JSON manifest supersedes it. Caller-
    supplied segment names outside the scheme are never touched
    (conservative — GC only eats what the index's own writers minted).

    Retention window (r12 ADVICE — all-or-nothing vacuum fails any
    reader that loaded a pre-GC manifest mid-scan): ``keep_versions``
    keeps the latest N manifest versions AND every segment directory
    any of them references, so a reader holding a manifest up to N-1
    versions stale survives a concurrent GC (Delta's
    ``delta.checkpointRetentionDuration``-style safety window, by
    version count). ``min_age_sec`` additionally skips any candidate
    whose modification time is younger than the window — the
    time-based vacuum guard for in-flight scans of freshly superseded
    generations. The defaults (keep latest only, no age floor)
    preserve the r12 in-query behavior where the drain is proven by
    construction; ops loops with concurrent readers should pass an
    N / age matched to their longest scan.

    Safe to delete precisely BECAUSE names are monotonic: a directory
    absent from every retained manifest can never be referenced by any
    future manifest version, so the only party GC can hurt is a reader
    holding a manifest OLDER than the retention window — run it after
    such scans drain (the same vacuum discipline as any LSM store).
    Driver-side Hadoop FS calls only; the one exception is a Spark
    parquet read of the LEGACY manifest's segment list when that
    manifest is retained by the age gate (its readers then need their
    segments protected). Returns the deleted entry names."""
    if keep_versions < 1:
        raise ValueError(f"keep_versions must be >= 1, got {keep_versions}")
    man = _load_manifest(spark, path)
    fs, root, jvm = _hadoop_fs(spark, path)
    now_ms = time.time() * 1000.0

    def _old_enough(st) -> bool:
        return (now_ms - st.getModificationTime()) >= min_age_sec * 1000.0

    # Retained manifest versions and the union of their segment lists.
    mfs, mdir, _ = _hadoop_fs(spark, os.path.join(path, MANIFEST_DIR))
    versions: list[tuple[int, object]] = []
    if mfs.exists(mdir):
        for st in mfs.listStatus(mdir):
            m = _MANIFEST_FILE_RE.fullmatch(st.getPath().getName())
            if m:
                versions.append((int(m.group(1)), st))
    versions.sort(key=lambda vs: -vs[0])
    retained = versions[:keep_versions]
    live: set[str] = set()
    for _, st in retained:
        stream = mfs.open(st.getPath())
        try:
            raw = bytes(
                jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()
        live.update(json.loads(raw)["segments"])
    if not retained:
        # No JSON log: the legacy/bare layout's current view is all
        # there is to protect.
        live.update(man["segments"])
    deleted: list[str] = []
    # Legacy parquet manifest: deletable once a JSON manifest
    # supersedes it and it clears the age gate; while it survives,
    # its readers' segment list joins the live set.
    lfs, lpath, _ = _hadoop_fs(spark, os.path.join(path, SEGMENT_MANIFEST))
    legacy_deletable = False
    if lfs.exists(lpath):
        if versions and _old_enough(lfs.getFileStatus(lpath)):
            legacy_deletable = True
        else:
            rows = spark.read.parquet(
                os.path.join(path, SEGMENT_MANIFEST)
            ).collect()
            live.update(r.segment for r in rows)
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if (
            _SEG_SCHEME_RE.fullmatch(name)
            and name not in live
            and _old_enough(st)
        ):
            fs.delete(st.getPath(), True)
            deleted.append(name)
    if retained:
        floor = retained[-1][0]
        for v, st in versions:
            if v < floor and _old_enough(st):
                mfs.delete(st.getPath(), False)
                deleted.append(f"{MANIFEST_DIR}/{st.getPath().getName()}")
    if legacy_deletable:
        lfs.delete(lpath, True)
        deleted.append(SEGMENT_MANIFEST)
    return deleted


def ivfpq_adc_from_index(
    spark,
    path: str,
    queries: DataFrame,
    topk: int = 5,
    m: int = 4,
    dim: int = DIM_DEFAULT,
    segments: tuple[str, ...] | None = None,
) -> DataFrame:
    """SERVE top-k ANN from a PERSISTED index (``ivfpq_index_write``'s
    layout) — raw vectors never load: the query set (query_id, v)
    assigns to its coarse list via the stored coarse centroids
    (broadcast argmin), candidates come from the stored codes table's
    coarse column, and ADC is the stored-codebook broadcast-LUT join
    over the m code columns. The scan reads (vec_id, coarse, c0..cm)
    only — the memory-bandwidth shape that makes the stored index
    worth having."""
    # ``segments`` lists the code tables to serve over; the default
    # (None) reads the index's segment MANIFEST — the authoritative
    # list ``ivfpq_index_write`` / ``_append`` / ``_compact`` maintain
    # — so serving can never silently drop an appended segment (r10
    # ADVICE). An explicit tuple is honored for surgical reads.
    # Per-segment scans union BEFORE the coarse filter, so each still
    # prunes to the (vec_id, coarse, c0..cm) columns.
    if segments is None:
        segments = tuple(_read_segment_manifest(spark, path))
    codes = spark.read.parquet(os.path.join(path, segments[0]))
    for seg in segments[1:]:
        codes = codes.unionByName(
            spark.read.parquet(os.path.join(path, seg))
        )
    co_cent = spark.read.parquet(os.path.join(path, "coarse_centroids"))
    pq_cent = spark.read.parquet(os.path.join(path, "pq_centroids"))
    d_sub = dim // m
    qc = _assign(
        queries.select(F.col("query_id").alias("vec_id"), "v"),
        _to_1row(co_cent),
    ).select(
        F.col("vec_id").alias("query_id"), F.col("cluster").alias("qcl")
    )
    cand = (
        qc.join(codes, F.col("qcl") == F.col("coarse"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", *[f"c{s}" for s in range(m)]
        )
    )
    lut_pd = F.expr(
        "aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)), "
        "0.0D, (acc, x) -> acc + x)"
    )
    # r13: the m per-sub LUT joins collapse into ONE — unpivot the
    # candidate's m code columns to (query_id, vec_id, sub, code) rows
    # and equi-join the single (query_id, sub, code) broadcast LUT
    # built from ONE scan of the stored pq_centroids. Identical pd
    # rows reach the DECIMAL adc sum.
    cand_sub = cand.select(
        "query_id",
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("sub"),
                        F.col(f"c{s}").alias("code"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("sc"),
    ).select("query_id", "vec_id", F.col("sc.sub").alias("sub"), F.col("sc.code").alias("code"))
    qsub = _explode_subs(
        queries.select("query_id", "v"), m, d_sub, id_col="query_id"
    ).withColumnRenamed("v", "qv")
    lut = qsub.join(pq_cent, "sub").select(
        "query_id", "sub", F.col("cluster").alias("code"), lut_pd.alias("pd")
    )
    allp = cand_sub.join(
        F.broadcast(lut), ["query_id", "sub", "code"]
    ).select("query_id", "vec_id", F.col("pd").cast(DIST_DEC).alias("pd"))
    adc = allp.groupBy("query_id", "vec_id").agg(F.sum("pd").alias("adc"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("adc").cast("double"), 6).alias("adc_dist"),
        )
    )


def ivfpq_adc_topk(
    emb: DataFrame,
    n_queries: int = 8,
    topk: int = 5,
    m: int = 4,
    k_pq: int = 16,
    k_coarse: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    dim: int = DIM_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end IVF-PQ approximate nearest neighbors (Jégou, Douze &
    Schmid, PAMI '11): the coarse k-means quantizer restricts each
    query to its own inverted list (single-probe IVF — a relational
    EQUI-join on the coarse cluster, never a driver-side probe list),
    and candidate distances are ASYMMETRIC DISTANCE COMPUTATION: the
    query's m subvectors are compared to each subspace codebook once
    (an n_queries x m x k_pq lookup table), and every candidate's
    distance is the sum of m table lookups keyed by its PQ codes —
    the scan touches codes, never raw vectors.

    Determinism: both quantizers are the engine's deterministic
    Lloyd's; LUT entries are the same left-to-right double fold every
    ANN oracle uses; the m partial distances are cast to DECIMAL
    before the per-candidate sum (order-free), so the (adc, vec_id)
    ranking is total and engine-independent.

    Plan shape: one decode + localCheckpoint of the vectors; coarse
    assignment localCheckpoints (it feeds both the query and candidate
    sides of the IVF join); each subspace trains on a lazy slice of
    the SAME base; LUTs are broadcast (n_queries x k_pq rows); the ADC
    join chain is candidates ⋈ codes ⋈ broadcast-LUT — all equi-joins
    keyed by vec_id / (query_id, code). At 100 TB: train both
    codebooks on a hash-sampled subset, localCheckpoint the tiny
    centroid tables, and this exact plan encodes + scans the full
    table with candidate volume bounded by N/k_coarse per query."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    base = _decoded_base(emb, id_col, vec_col)
    # Fused multi-subspace path (r13): ONE (sub, cluster)-keyed Lloyd
    # chain over the exploded table, its tiny (m*k_pq)-row codebook
    # localCheckpointed so the encode, the LUT and nothing else ever
    # re-executes training; the per-sub parts union collapses into a
    # single (query_id, sub, code) LUT equi-join. Identical rows reach
    # the DECIMAL adc sum — same per-subspace arithmetic, same
    # (query_id, vec_id) groups. The coarse and PQ chains are
    # independent, so they run as concurrent driver-thread jobs
    # (guide §2.6).
    bsub = _explode_subs(base, m, d_sub)
    coarse, cent = _run_concurrent(
        lambda: _lloyd_from_base(base, k_coarse, iters, dim)
        .select("vec_id", "cluster")
        .localCheckpoint(),
        lambda: _lloyd_multi_cents(
            bsub, k_pq, iters, d_sub, seed="first"
        ).localCheckpoint(),
    )
    qc = coarse.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("cluster").alias("qcl")
    )
    cand = (
        qc.join(coarse, F.col("qcl") == F.col("cluster"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    qbase = base.filter(F.col("vec_id") < n_queries)
    lut_pd = F.expr(
        "aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)), "
        "0.0D, (acc, x) -> acc + x)"
    )
    codes = _assign_multi(bsub, _to_persub(cent)).select(
        "vec_id", "sub", F.col("cluster").alias("code")
    )
    qsub = _explode_subs(
        qbase.select(F.col("vec_id").alias("query_id"), "v"),
        m,
        d_sub,
        id_col="query_id",
    ).withColumnRenamed("v", "qv")
    lut = qsub.join(cent, "sub").select(
        "query_id", "sub", F.col("cluster").alias("code"), lut_pd.alias("pd")
    )
    allp = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .select("query_id", "vec_id", F.col("pd").cast(DIST_DEC).alias("pd"))
    )
    adc = allp.groupBy("query_id", "vec_id").agg(F.sum("pd").alias("adc"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("adc").cast("double"), 6).alias("adc_dist"),
        )
    )


def pca_top_component(
    emb: DataFrame,
    dim: int = DIM_DEFAULT,
    iters: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal component of the embedding covariance via
    deterministic POWER ITERATION — the whitening/compression
    primitive (PCA) expressed relationally, with every reduction
    order-free or left-to-right so the result is bit-reproducible
    across engines and partitionings.

    The (scaled) covariance M_ij = n*S_xy - S_x*S_y builds from
    DECIMAL-exact sufficient statistics: per-dim sums from a DIM-tuple
    explode, S_xy from the UPPER-TRIANGLE explode only (mirrored by
    symmetry — commutative double products make the mirror
    bit-identical to the full grid), all after spread_for_fanout so a
    one-row-group scan can't serialize the fan-out; scaling by 1/n^2 is
    dropped because
    eigenvectors are scale-invariant (the eigenvalue column reports
    the SCALED spectrum of M, stated in its name). Iterations are
    matvecs: each of the 64 matrix rows is an ordered array, u = M v
    is a left-to-right fold per row, and normalization folds the
    ordered u array — no cross-row double sum anywhere. v0 = all-ones
    (fixed), so even the sign of the result is deterministic. After
    `iters` rounds the Rayleigh product v . (M v) estimates the top
    eigenvalue of M (convergence rate depends on the eigengap; on
    isotropic data the VECTOR may wander but every engine wanders
    identically, which is what the differential gate needs).

    Plan: one scan -> dim^2-key agg; the 64-row matrix localCheckpoints
    (each iteration re-reads it); every iteration is a broadcast
    crossJoin of a 1-row vector against 64 rows plus a 64-row agg —
    driver never sees data. At 100 TB: identical, with the sufficient
    statistics computed over the deterministic hash sample like any
    covariance estimate."""
    spread = spread_for_fanout(emb, id_col)
    dec = "decimal(24,12)"
    # Per-dim sums once (the per-(i,j)-group sx/sy and count are the
    # same order-free DECIMAL addend sets for every pair a dim appears
    # in), sxy on the upper triangle only, mirrored by symmetry —
    # identical values to the naive full-grid form at ~1/6 the decimal
    # work per exploded tuple.
    dsum = (
        spread.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, {dim - 1}), "
                    f"i -> struct(i AS d, double({vec_col}[i]) AS x))"
                )
            ).alias("p")
        )
        .select("p.*")
        .groupBy("d")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        )
    )
    tri = (
        spread.select(
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(0, {dim - 1}), "
                    f"i -> transform(sequence(i, {dim - 1}), "
                    f"j -> struct(i AS i, j AS j, "
                    f"double({vec_col}[i]) * double({vec_col}[j]) AS xy))))"
                )
            ).alias("p")
        )
        .select("p.*")
        .groupBy("i", "j")
        .agg(F.sum(F.col("xy").cast(dec)).cast("double").alias("sxy"))
    )
    s = tri.join(
        F.broadcast(
            dsum.select(
                F.col("d").alias("i"), F.col("n"), F.col("sx").alias("sx_i")
            )
        ),
        "i",
    ).join(
        F.broadcast(dsum.select(F.col("d").alias("j"), F.col("sx").alias("sx_j"))),
        "j",
    )
    m_tri = s.select(
        "i",
        "j",
        (F.col("n") * F.col("sxy") - F.col("sx_i") * F.col("sx_j")).alias(
            "mij"
        ),
    )
    m = m_tri.union(
        m_tri.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "mij"
        )
    )
    rows = (
        m.groupBy("i")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "mij"))),
                lambda c: c["mij"],
            ).alias("row")
        )
        .localCheckpoint()
    )
    ones = "array(" + ", ".join(["1.0D"] * dim) + ")"
    v = emb.sparkSession.range(1).select(F.expr(ones).alias("v"))
    matvec = F.expr(
        "aggregate(zip_with(row, v, (x, y) -> x * y), "
        "0.0D, (acc, x) -> acc + x)"
    )
    for _ in range(iters):
        u = rows.crossJoin(F.broadcast(v)).select("i", matvec.alias("u"))
        uarr = u.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "u"))),
                lambda c: c["u"],
            ).alias("uarr")
        )
        v = uarr.select(
            "uarr",
            F.sqrt(
                F.expr(
                    "aggregate(transform(uarr, y -> y * y), "
                    "0.0D, (acc, x) -> acc + x)"
                )
            ).alias("nrm"),
        ).select(
            F.expr("transform(uarr, x -> x / nrm)").alias("v")
        )
        # Truncate the iteration lineage at the 1-row vector: without
        # this every later reference to v (the next matvec, the final
        # Rayleigh product, the output projection — v is consumed 3x
        # after the loop) re-executes ALL prior iterations' shuffle
        # stages. Measured: ~27s -> covariance-build + 6 tiny jobs.
        v = v.localCheckpoint()
    u_fin = rows.crossJoin(F.broadcast(v)).select("i", matvec.alias("u"))
    ua = u_fin.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "u"))),
            lambda c: c["u"],
        ).alias("uarr")
    )
    lam = ua.crossJoin(F.broadcast(v)).select(
        F.expr(
            "aggregate(zip_with(v, uarr, (x, y) -> x * y), "
            "0.0D, (acc, x) -> acc + x)"
        ).alias("lam")
    )
    dims = emb.sparkSession.range(dim).select(F.col("id").cast("int").alias("dim"))
    return (
        dims.crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(lam))
        .select(
            "dim",
            F.round(F.expr("v[dim]"), 6).alias("loading"),
            F.round("lam", 6).alias("scaled_eigenvalue"),
        )
    )
