#!/usr/bin/env python
"""Physical-plan audit of the headline queries: one JSON line per
query with the scale-critical properties — exchange count (hash /
range / single-partition), broadcast joins, pushed filters, and any
cartesian/nested-loop fallback. The per-round eyeball that every
plan still has the shape SURVEY §4 claims.

Usage: python tools/plan_audit.py [sf_dir]  (default sf0.001 — plan
shapes don't depend on data volume).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from stock_data_project_spark.plans import all_queries  # noqa: E402
from stock_data_project_spark.session import get_spark  # noqa: E402


def audit(plan: str) -> dict:
    return {
        "exchanges_hash": len(re.findall(r"Exchange hashpartitioning", plan)),
        "exchanges_range": len(re.findall(r"Exchange rangepartitioning", plan)),
        "exchanges_single": len(re.findall(r"Exchange SinglePartition", plan)),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "cartesian": "CartesianProduct" in plan,
        "bnl_join": "BroadcastNestedLoopJoin" in plan,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = all_queries()
    # the r5-built r6-window keys (batch only: stream_* keys RUN their
    # query when invoked — the streaming plans are pinned by
    # tests/test_streaming.py instead)
    extra = (
        "williams_r",
        "mfi",
        "ulcer_index",
        "linear_interp",
        "frequent_tokens",
        "contamination_flags",
        "bigram_logprob",
        "capped_counts",
        "split_counts",
        "scd2_dim",
        "scd2_asof",
        "session_concurrency",
        "data_quality_audit",
        "expectation_gate",
        "user_influence",
        "bpe_token_count",
        "snapshot_delta",
        "sql_decayed_revenue",
        # r6-built keys (batch; scd2_late_gate/stream_quantile are
        # streaming-driven and pinned by their own tests).
        # triangle_count collects scalars when invoked, so its plan is
        # audited via the wedge-close shape inside the key's own test.
        "quantile_rollup",
        "tpch_q18",
        "cohort_ltv",
        "frequent_pairs",
        "stratified_sample",
        "topk_rollup",
        "ema_cross",
        "roc_momentum",
        # r7-built keys (batch; stream_late_data is streaming-driven
        # and pinned by tests/test_next4_staged.py)
        "semantic_dedup",
        "conversion_lag",
        "funnel_attribution",
        "skew_report",
        # bloom_join_prune runs its bitmap-build job when invoked (like
        # the fit-style keys) but returns a lazy probe plan — audited
        "bloom_join_prune",
        # r8-built keys (batch; the 5 new headline families are in
        # HEADLINE already; stream_distinct_users is streaming-driven
        # and pinned by tests/test_next5_staged.py)
        "aroon",
        "cmf",
        "keltner",
    )
    out = {}
    for name in tuple(HEADLINE) + extra:
        try:
            plan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            out[name] = audit(plan)
        except Exception as e:  # noqa: BLE001 - report, don't abort the audit
            out[name] = {"error": str(e).splitlines()[0][:120]}
    # SinglePartition exchanges are reported but NOT flagged: a
    # global scalar aggregate (q6/q17's one-row result) or a
    # metadata-sized offsets table (distributed_ntile) necessarily
    # funnels its PARTIAL rows — one per task — through one; that is
    # every engine's global-agg shape, not a serialization hazard.
    # The hazards worth failing on are unhinted cross products.
    expected_bnl = {
        # classifier_calibration joins the 9-row threshold grid to
        # the ≤(T+1)·2-row bin rollup on a literal-true condition
        # (suffix sums over metadata) — a broadcast of 9 rows, the
        # triangular-offsets class
        "classifier_calibration",
        # distributed_ntile's triangular offsets: a <=-inequality
        # join against the 32-row per-partition-count table — a
        # deliberate metadata-sized broadcast (test_rank pins it)
        "ntile_deciles",
        # 1-row scalar-aggregate crossJoins (the documented class —
        # same shape as olap.py's threshold scalars): heavy_hitters'
        # total-token count, the audit's per-column distinct scalars,
        # the gate's n_rows scalar. A BNL against one broadcast row
        # is a constant-cost bind, not a cross-product hazard.
        "frequent_tokens",
        "data_quality_audit",
        "expectation_gate",
        # quantile_rollup binds two metadata-sized broadcasts: the
        # 1-row (lo, hi) domain aggregate and the 3-row percentile
        # frame — both against sketch-sized (≤ types×512 rows)
        # inputs; constant-cost binds, same class as above
        "quantile_rollup",
        # conversion_lag is quantile_rollup's estimator applied to
        # the lag join — the identical two metadata-sized binds
        "conversion_lag",
        # bm25_rank binds the 1-row (N, avgdl) corpus-stats aggregate
        # — the same constant-cost scalar-bind class
        "bm25_rank",
        # rfm_segmentation runs distributed_ntile 3× — each carries
        # the ntile_deciles triangular-offsets BNL (metadata-sized,
        # test_rank pins it) plus the 1-row ref-date scalar bind
        "rfm_segmentation",
        # basket_lift binds the 1-row basket-count scalar; pair and
        # support joins are hash/broadcast
        "basket_lift",
        # tfidf_retrieval binds the 1-row corpus-size scalar inside
        # the idf weight build (the tfidf_top_terms class)
        "tfidf_retrieval",
        # source_mix_report binds the 1-row total-token scalar for
        # the token_share denominator — same constant-cost class
        "source_mix_report",
        # retrieval_ndcg wraps tfidf_retrieval and inherits its 1-row
        # corpus-size scalar bind
        "retrieval_ndcg",
        # kruskal_wallis binds the 1-row tie-sum scalar aggregate —
        # the documented constant-cost class
        "kruskal_wallis",
        # welch_ttest's triangular pair join: the 5-row per-segment
        # stats table self-joined on seg_a < seg_b (inequality ⇒ BNL
        # by construction) — metadata-sized broadcast, the
        # ntile_deciles triangular-offsets class
        "welch_ttest",
        # mann_whitney_u builds the same 10-row triangular pair table
        # (segs × segs on seg_a < seg_b) and additionally routes the
        # (seg, cents) stats through an OR-condition broadcast join
        # against it — both metadata-sized binds, the welch class
        "mann_whitney_u",
        # dsir_importance binds the 1-row (t_raw, t_tgt, v) vocab
        # totals for the smoothing denominators — the documented
        # constant-cost scalar-bind class
        "dsir_importance",
        # event_mutual_info binds the two 1-row marginal-entropy
        # aggregates onto the 1-row MI aggregate — the documented
        # constant-cost scalar-bind class
        "event_mutual_info",
        # source_quality_gate binds the 1-row corpus-token total for
        # the token_share denominator — the source_mix_report class
        "source_quality_gate",
    }
    flagged = [
        k
        for k, v in out.items()
        if v.get("cartesian") or (v.get("bnl_join") and k not in expected_bnl)
    ]
    print(json.dumps({"sf_dir": sf_dir, "queries": out, "flagged": flagged}))


if __name__ == "__main__":
    main()
