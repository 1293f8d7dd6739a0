"""Suite-wide physical-plan lints shared by the parity sweep.

The one lint here is the single-partition-window ban: a Spark window
with no PARTITION BY plans as ONE task sorting its whole input. Over a
bounded-domain table (a 10-row decile grid, a <=64-row block-offset
table, a month dimension) that is the correct, deliberate shape; over
an entity-grain table (customers, users, documents) it is the
one-reducer trap that dies at 100 TB. Plans can't see cardinality, so
the lint is allowlist-based: every query whose physical plan contains
an unpartitioned window must carry a documented bounded-domain reason
in ALLOWED_UNPARTITIONED below — adding an entry is a code-review
event, which is the point. (Same enforcement style as the suite-wide
CartesianProduct bans in test_plans.py.)
"""

from __future__ import annotations


def unpartitioned_window_specs(plan: str) -> list[str]:
    """Return a snippet for every ``windowspecdefinition`` in the plan
    string whose partition-column list is empty.

    In the executed-plan rendering the spec is
    ``windowspecdefinition(part..., order ASC/DESC NULLS ...,
    specifiedwindowframe(...))`` — partition columns come first and
    carry no sort direction, order columns always carry ``ASC``/
    ``DESC``, and the frame is last. So the spec is unpartitioned iff
    its FIRST top-level argument is an order column (has a direction)
    or the frame itself (unpartitioned AND unordered).
    """
    key = "windowspecdefinition("
    found: list[str] = []
    i = plan.find(key)
    while i >= 0:
        k = i + len(key)
        depth = 1
        first_arg: list[str] = []
        while k < len(plan) and depth > 0:
            c = plan[k]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            if depth == 1 and c == ",":
                break
            if depth > 0:
                first_arg.append(c)
            k += 1
        first = "".join(first_arg).strip()
        if (
            first.startswith("specifiedwindowframe")
            or " ASC" in first
            or " DESC" in first
        ):
            found.append(plan[i : i + 120])
        i = plan.find(key, i + 1)
    return found


# Queries allowed to contain unpartitioned windows, each with the
# bounded-domain reason. "block/offset table" = the two-level parallel
# prefix's per-block aggregate (cardinality = block count, a constant);
# other entries name the small grid the window runs over. Entity-grain
# (customer/user/document/fact) inputs are NEVER a valid reason — that
# is the one-reducer trap this lint exists to ban (round-7 verdict).
ALLOWED_UNPARTITIONED: dict[str, str] = {
    "ann_ivfpq_multiprobe_topk": "Lloyd/codebook id grids (k<=256 rows)",
    "ann_ivfpq_sampled_codebooks": "Lloyd/codebook id grids (k<=256 rows)",
    "corpus_bpe_first_merges": "top merge-candidate table after top-k cut",
    "corpus_quality_curriculum": "bounded quality-bucket grid",
    "corpus_sequence_packing": "chunk-id block-offset table",
    "corpus_vocabulary_growth": "event-time vocabulary grid (bounded buckets)",
    "corpus_zipf_fit": "top-K token frequency table (K bounded)",
    "customer_revenue_gini": "bounded revenue-bucket grid (two-level prefix)",
    "customer_rfm_segments": "block/offset tables of the two-level prefix rank",
    "events_engagement_auc": "per-score-group table (bounded score domain)",
    "events_engagement_gains": "score block/offset table + 10-row decile grid",
    "events_hourly_anomalies": "hour grid (bounded)",
    "events_km_time_to_purchase": "bounded duration grid (<=1440 rows)",
    "events_lateness_histogram": "block-offset table of the two-level prefix",
    "events_user_growth_accounting": "day grid (bounded)",
    "events_value_drift_psi": "decile-edge grid (bounded)",
    "events_value_ks_drift": "bounded value-bucket grid (two-level ECDF)",
    "hybrid_rerank_cross_encoder_seam": "candidate-bounded rerank list",
    "hybrid_rerank_stage2": "candidate-bounded rerank lists (top-k per stage)",
    "hybrid_rrf_retrieval": "candidate-bounded retrieval lists (top-k)",
    "monthly_revenue_growth": "month grid (bounded)",
    "orders_monthly_ma_decomposition": "month grid (bounded)",
    "orders_open_backlog_timeline": "date grid (bounded)",
    "orders_poisson_bootstrap_ci": "bootstrap-replicate grid (B bounded)",
    "revenue_decile_shares": "block/offset table of the two-level prefix rank",
    "source_token_apportionment": "source dimension (handful of rows)",
    "supplier_efficiency_frontier": "block-offset table of the two-level prefix (r8 rewrite)",
    "supplier_on_time_eb_shrinkage": "block-offset table of the two-level prefix (r8 rewrite)",
}
