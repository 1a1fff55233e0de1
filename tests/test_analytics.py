"""Semantic invariants for the late-r7 tranche-2 operators: hybrid RRF
retrieval, filtered vector search, time-series gap-fill / rolling /
transitions, and the data-audit family.

The DuckDB hash oracle (tools/compare.py) proves cross-engine equality;
these tests pin the SEMANTICS each operator promises — RRF arithmetic,
pre-filter recall sets, spine completeness and LOCF carry, RANGE-frame
arithmetic, probability normalization, blocking correctness — plus the
plan shapes that must survive a 100× scale-up."""

from __future__ import annotations

import math

import pytest

from elastic_stream_spark.operators.data_audit import (
    FUZZY_MAX_DIST,
    SKEW_TOP,
    WINSOR_HI,
    WINSOR_LO,
    column_profile,
    fuzzy_name_match,
    key_skew_audit,
    winsorized_event_stats,
)
from elastic_stream_spark.operators.retrieval_fusion import (
    FUSE_SEEDS,
    FUSE_TOP,
    FV_LANG,
    FV_TOP_K,
    RRF_K,
    filtered_vector_search,
    hybrid_rrf_search,
)
from elastic_stream_spark.operators.timeseries import (
    RFM_BUCKETS,
    ROLL_DAYS,
    Z_FLAG,
    daily_anomaly_zscore,
    event_transitions,
    pit_feature_join,
    rfm_segments,
    rolling_revenue_7d,
    scd2_user_history,
    ts_gapfill_locf,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------ retrieval


def test_hybrid_rrf_scores_and_seeds(spark):
    rows = hybrid_rrf_search(spark, SF_DIR).collect()
    by_qid: dict = {}
    for r in rows:
        by_qid.setdefault(r.qid, []).append(r)
        # a seed never retrieves itself
        assert r.doc_id != r.qid
        # rrf arithmetic: score == Σ 1/(K + rank) over the present arms
        want = 0.0
        if r.sparse_rank is not None:
            want += 1.0 / (RRF_K + r.sparse_rank)
        if r.dense_rank is not None:
            want += 1.0 / (RRF_K + r.dense_rank)
        assert r.rrf_score == pytest.approx(want, abs=1e-6)
        # at least one arm contributed
        assert r.sparse_rank is not None or r.dense_rank is not None
    assert set(by_qid) == set(FUSE_SEEDS)
    for qid, grp in by_qid.items():
        grp.sort(key=lambda r: r.rank)
        assert [r.rank for r in grp] == list(range(1, FUSE_TOP + 1))
        # fused order is by score (desc), doc_id tie-break
        scores = [r.rrf_score for r in grp]
        assert scores == sorted(scores, reverse=True)
        # a doc ranked #1 by BOTH arms must be fused #1 (dominance)
        both_first = [
            r for r in grp if r.sparse_rank == 1.0 and r.dense_rank == 1.0
        ]
        if both_first:
            assert both_first[0].rank == 1


def test_filtered_vector_search_prefilter_semantics(spark):
    out = filtered_vector_search(spark, SF_DIR)
    rows = out.collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    en_ids = {r.doc_id for r in docs.where(f"lang = '{FV_LANG}'").collect()}
    by_q: dict = {}
    for r in rows:
        assert r.neighbor_id in en_ids  # pre-filter: recall set is filtered corpus
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, grp in by_q.items():
        grp.sort(key=lambda r: r.rank)
        assert [r.rank for r in grp] == list(range(1, FV_TOP_K + 1))
        cos = [r.cosine for r in grp]
        assert cos == sorted(cos, reverse=True)
        assert all(-1.000001 <= c <= 1.000001 for c in cos)


# ----------------------------------------------------------- timeseries


def test_ts_gapfill_spine_and_locf(spark):
    rows = ts_gapfill_locf(spark, SF_DIR).collect()
    types = {r.event_type for r in rows}
    buckets = sorted({r.bucket for r in rows})
    # complete rectangular spine: every type × every hour in [lo, hi]
    n_hours = int((buckets[-1] - buckets[0]).total_seconds() // 3600) + 1
    assert len(buckets) == n_hours
    assert len(rows) == len(types) * n_hours
    for t in types:
        seq = sorted((r for r in rows if r.event_type == t), key=lambda r: r.bucket)
        last_seen = None
        for r in seq:
            if r.n_events == 0:
                # gap row: LOCF carries the previous observed average
                assert r.avg_value_locf == last_seen
            else:
                assert r.avg_value_locf is not None
                last_seen = r.avg_value_locf


def test_rolling_revenue_range_frame(spark):
    rows = rolling_revenue_7d(spark, SF_DIR).collect()
    by_day = {r.order_day: r for r in rows}
    days = sorted(by_day)
    for d in days:
        # RANGE frame: sum of day_revenue over calendar days in
        # (d - ROLL_DAYS, d] — gaps shorten the frame
        want = sum(
            by_day[e].day_revenue
            for e in days
            if 0 <= (d - e).total_seconds() < ROLL_DAYS * 86400
        )
        assert getattr(by_day[d], f"rolling_{ROLL_DAYS}d") == pytest.approx(
            want, abs=0.01
        )
    first = by_day[days[0]]
    assert getattr(first, f"rolling_{ROLL_DAYS}d") == pytest.approx(
        first.day_revenue, abs=0.005
    )


def test_event_transitions_normalized(spark):
    rows = event_transitions(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user contributes (count - 1) transitions
    assert sum(r.n for r in rows) == n_events - n_users
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for f_type, grp in by_from.items():
        assert sum(r.p for r in grp) == pytest.approx(1.0, abs=0.01)
        tot = sum(r.n for r in grp)
        for r in grp:
            assert r.p == pytest.approx(r.n / tot, abs=1e-4)


def test_daily_anomaly_zscore_moments(spark):
    rows = daily_anomaly_zscore(spark, SF_DIR).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
        assert r.is_anomaly == (abs(r.z) >= Z_FLAG)
    for t, grp in by_type.items():
        ns = [r.n_events for r in grp]
        mean = sum(ns) / len(ns)
        var = sum((x - mean) ** 2 for x in ns) / (len(ns) - 1)
        for r in grp:
            assert r.z == pytest.approx((r.n_events - mean) / math.sqrt(var), abs=1e-3)
        # z-scores of a sample against its own moments: mean ≈ 0
        assert sum(r.z for r in grp) == pytest.approx(0.0, abs=0.01)


def test_rfm_segments_partition_counts(spark):
    rows = rfm_segments(spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust  # cells partition customers
    for r in rows:
        for q in (r.r_quartile, r.f_quartile, r.m_quartile):
            assert 1 <= q <= RFM_BUCKETS
        assert r.avg_monetary > 0
    # each R quartile holds ~n/4 customers (ntile balance)
    per_r: dict = {}
    for r in rows:
        per_r[r.r_quartile] = per_r.get(r.r_quartile, 0) + r.n_customers
    assert set(per_r) == set(range(1, RFM_BUCKETS + 1))
    assert max(per_r.values()) - min(per_r.values()) <= 1


def test_scd2_intervals_partition_time(spark):
    """SCD-2 invariants: per user the validity intervals tile the time
    axis — consecutive, non-overlapping, exactly one open current row —
    and versions are dense from 1."""
    rows = scd2_user_history(spark, SF_DIR).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_purch = ev.where("event_type = 'purchase'").count()
    assert len(rows) == n_purch
    for u, grp in by_user.items():
        grp.sort(key=lambda r: r.version)
        assert [r.version for r in grp] == list(range(1, len(grp) + 1))
        currents = [r for r in grp if r.is_current]
        assert len(currents) == 1 and currents[0] is grp[-1]
        assert grp[-1].valid_to is None
        for a, b in zip(grp, grp[1:]):
            assert a.valid_to == b.valid_from  # tiling, no gaps/overlap
            # <=: equal-timestamp purchases make a legitimate
            # zero-length version (tie broken by event_id)
            assert a.valid_from <= a.valid_to


def test_pit_feature_join_no_leakage(spark):
    """Point-in-time correctness: the attached feature must equal the
    user's last purchase AT OR BEFORE the click — recomputed naively
    from the raw events — and never reflect a later purchase."""
    rows = pit_feature_join(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    purch: dict = {}
    for e in ev:
        if e.event_type == "purchase":
            purch.setdefault(e.user_id, []).append(e)
    for ps in purch.values():
        ps.sort(key=lambda e: (e.ts, e.event_id))
    n_clicks = sum(1 for e in ev if e.event_type == "click")
    assert len(rows) == n_clicks
    for r in rows:
        past = [p for p in purch.get(r.user_id, []) if p.ts <= r.click_ts]
        assert r.purchases_before == len(past)
        if past:
            assert r.last_purchase_value == pytest.approx(
                round(past[-1].value, 4), abs=1e-9
            )
        else:
            assert r.last_purchase_value is None


def test_pit_and_scd2_edge_corpus(spark, workdir):
    """Adversarial micro-fixture: equal-timestamp purchase+click (the
    inclusive-as-of tie), a user with clicks but no purchases (NULL
    feature, zero count), a user with purchases only (no output), and
    a double purchase at the same instant (zero-length SCD-2 version)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # u1: purchase and click at the SAME instant → click sees it
        (1, t0, 1, "purchase", 10.0, "{}"),
        (2, t0, 1, "click", 0.0, "{}"),
        # u2: click only → NULL feature, purchases_before = 0
        (3, t0, 2, "click", 0.0, "{}"),
        # u3: purchase only → no click row emitted
        (4, t0, 3, "purchase", 7.0, "{}"),
        # u4: two purchases at the same instant, then a click →
        # zero-length first SCD version; click sees the later (by
        # event_id) purchase value
        (5, t0, 4, "purchase", 1.0, "{}"),
        (6, t0, 4, "purchase", 2.0, "{}"),
        (7, t0 + dt.timedelta(hours=1), 4, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{workdir}/events.parquet")

    pit = {r.click_id: r for r in pit_feature_join(spark, workdir).collect()}
    assert set(pit) == {2, 3, 7}
    assert pit[2].last_purchase_value == 10.0 and pit[2].purchases_before == 1
    assert pit[3].last_purchase_value is None and pit[3].purchases_before == 0
    assert pit[7].last_purchase_value == 2.0 and pit[7].purchases_before == 2

    scd = {}
    for r in scd2_user_history(spark, workdir).collect():
        scd.setdefault(r.user_id, []).append(r)
    assert set(scd) == {1, 3, 4}
    u4 = sorted(scd[4], key=lambda r: r.version)
    assert [r.value for r in u4] == [1.0, 2.0]
    assert u4[0].valid_from == u4[0].valid_to  # zero-length version
    assert u4[1].is_current and u4[1].valid_to is None


def test_winsorized_event_stats_bounds(spark):
    rows = winsorized_event_stats(spark, SF_DIR).collect()
    for r in rows:
        assert r.p05 <= r.winsorized_mean <= r.p95
        # clip fractions bracket the percentile definition
        assert r.n_clipped_low <= r.n * WINSOR_LO + 1
        assert r.n_clipped_high <= r.n * (1 - WINSOR_HI) + 1
        assert r.n_clipped_low >= 0 and r.n_clipped_high >= 0


# ----------------------------------------------------------- data audit


def test_key_skew_audit_shares(spark):
    rows = sorted(key_skew_audit(spark, SF_DIR).collect(), key=lambda r: r.rank)
    assert len(rows) <= SKEW_TOP
    counts = [r.n_rows for r in rows]
    assert counts == sorted(counts, reverse=True)
    # cumulative share is monotone and consistent with per-key shares
    cum = 0.0
    for r in rows:
        cum += r.share
        assert r.cum_share == pytest.approx(cum, abs=1e-4)
    assert rows[-1].cum_share <= 1.0 + 1e-9


def test_column_profile_invariants(spark):
    rows = {r.col_name: r for r in column_profile(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    assert set(rows) == {"doc_id", "lang", "n_chars", "source", "text"}
    for r in rows.values():
        assert r.n_rows == n
        assert r.n_null == 0  # fixture has no nulls
        assert r.min_len <= r.max_len
        assert r.min_len <= r.avg_len <= r.max_len
    assert rows["doc_id"].n_distinct == n  # primary key
    assert rows["lang"].n_distinct <= 10


def test_jsonl_roundtrip_totals_and_schema(spark):
    """The JSONL ingest audit must account for every document exactly
    once, and the explicit-schema read must not grow an inference or
    corrupt-record column."""
    from elastic_stream_spark.operators.data_audit import (
        JSONL_SCHEMA,
        _documents_jsonl_dir,
        jsonl_roundtrip_audit,
    )

    out = jsonl_roundtrip_audit(spark, SF_DIR)
    rows = out.collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert sum(r.sum_chars for r in rows) == (
        docs.agg({"n_chars": "sum"}).collect()[0][0]
    )
    back = spark.read.schema(JSONL_SCHEMA).json(
        _documents_jsonl_dir(spark, SF_DIR)
    )
    assert [f.name for f in back.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]


def test_fuzzy_name_match_blocking(spark):
    rows = fuzzy_name_match(spark, SF_DIR).collect()
    for r in rows:
        assert r.name_a < r.name_b
        assert r.dist <= FUZZY_MAX_DIST
        # blocked: both names share the second token
        assert r.name_a.split(" ")[1] == r.name_b.split(" ")[1]
        assert r.n_a >= 1 and r.n_b >= 1
        # sanity: reported distance is a real edit distance (symmetric,
        # ≥ 1 for distinct names)
        assert r.dist >= 1


# ----------------------------------------------------------- plan shapes


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_tranche2_plans_no_cartesian(spark):
    for fn in (
        hybrid_rrf_search,
        filtered_vector_search,
        ts_gapfill_locf,
        rolling_revenue_7d,
        event_transitions,
        key_skew_audit,
        column_profile,
        fuzzy_name_match,
        daily_anomaly_zscore,
        rfm_segments,
        winsorized_event_stats,
        scd2_user_history,
        pit_feature_join,
    ):
        plan = _formatted_plan(fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, fn.__name__
        # BroadcastNestedLoopJoin is allowed ONLY with a broadcast side
        # that is constant-bounded: the probe set (queries × corpus with
        # a != predicate) or a 1-row scalar attach (bounds/total on a
        # folded constant key).  Both are corpus-size-independent on the
        # broadcast side; a data×data nested loop would show up as a
        # CartesianProduct (asserted absent) because neither data side
        # fits the broadcast threshold at scale.


def test_key_skew_topk_plan(spark):
    """The hottest-k selection must plan as TakeOrderedAndProject
    (per-partition heaps + k-row driver merge) — a global sort of the
    per-key counts would single-partition the corpus at 100 TB."""
    plan = _formatted_plan(key_skew_audit(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_column_profile_shuffles_fingerprints_not_payloads(spark):
    """The profile's first exchange must carry the md5 fingerprint, not
    the raw value — at 100 TB the text column would otherwise move
    wholesale just to be counted."""
    plan = _formatted_plan(column_profile(spark, SF_DIR))
    assert "Expand" not in plan  # single distinct path, two-level agg
    # the fingerprint projection must exist at all...
    assert "md5(" in plan
    # ...and every AGGREGATE exchange (hashpartitioning — the only
    # data-sized shuffles; the leading round-robin balance exchange of
    # the raw scan is load_table_balanced's fixture leveler, not part of
    # the profile plan) must carry only (col_name, h, len, counts):
    # neither the exploded kv struct nor the raw text payload may ride.
    blocks = [b for b in plan.split("\n\n") if "hashpartitioning" in b]
    assert blocks, "plan has no hash-partitioned exchange"
    for b in blocks:
        input_line = next(l for l in b.splitlines() if l.startswith("Input"))
        assert "kv#" not in input_line and "text#" not in input_line, b


def test_fuzzy_match_blocked_join_is_equi(spark):
    """The record-linkage candidate join must be an equi (hash) join on
    the blocking key — a nested-loop over names would be n² at scale."""
    plan = _formatted_plan(fuzzy_name_match(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------ r8 additions


def test_pack_doc_spans_tile_exactly(spark):
    """Fragment spans must tile: per source, span lengths sum to the
    shard's token total; per (source, seq), every sequence except the
    shard's last is filled to exactly PACK_BUDGET; no fragment exceeds
    the budget and offsets stay inside their document."""
    from pyspark.sql import functions as F

    from elastic_stream_spark.operators.curation import (
        PACK_BUDGET,
        pack_doc_spans,
    )

    rows = pack_doc_spans(spark, SF_DIR).collect()
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "source",
            F.size(F.split(F.lower("text"), " ")).alias("n_tokens"),
        )
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    )
    totals = {r.source: r.total for r in docs}
    by_source: dict = {}
    by_seq: dict = {}
    for r in rows:
        assert 1 <= r.span_len <= PACK_BUDGET
        assert r.doc_offset >= 0
        by_source[r.source] = by_source.get(r.source, 0) + r.span_len
        by_seq[(r.source, r.seq)] = by_seq.get((r.source, r.seq), 0) + r.span_len
    assert by_source == totals
    last_seq = {s: max(k[1] for k in by_seq if k[0] == s) for s in by_source}
    for (s, seq), filled in by_seq.items():
        if seq < last_seq[s]:
            assert filled == PACK_BUDGET, (s, seq, filled)
        else:
            assert filled <= PACK_BUDGET


def test_corpus_split_by_source_is_group_disjoint(spark):
    """Every source lands in exactly one split (the leakage-safe
    property) and the rollup reconciles with the corpus."""
    from elastic_stream_spark.operators.curation import corpus_split_by_source

    rows = corpus_split_by_source(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_sources = docs.select("source").distinct().count()
    assert sum(r.n_sources for r in rows) == n_sources
    assert sum(r.n_docs for r in rows) == docs.count()
    assert {r.split for r in rows} == {"train", "val", "test"}


def test_dedup_survivorship_merges_cluster_provenance(spark):
    """The survivor is its cluster's min doc_id; member counts and char
    totals reconcile against the raw cluster table."""
    from elastic_stream_spark.operators.pipeline import (
        dedup_clusters,
        dedup_survivorship,
    )

    surv = {r.keep_doc_id: r for r in dedup_survivorship(spark, SF_DIR).collect()}
    clusters = dedup_clusters(spark, SF_DIR).collect()
    by_cluster: dict = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    assert set(surv) == set(by_cluster)
    for cid, members in by_cluster.items():
        assert surv[cid].n_members == len(members)
        assert cid == min(members)
        assert surv[cid].sources  # non-empty provenance


def test_approx_quantile_audit_contract(spark):
    """The sketch must sit inside the exact ±1%-rank window per type,
    and the published exact percentiles must be ordered and reconcile
    with a direct exact computation."""
    from pyspark.sql import functions as F

    from elastic_stream_spark.operators.data_audit import (
        approx_quantile_audit,
    )

    rows = approx_quantile_audit(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert len(rows) == ev.select("event_type").distinct().count()
    direct = {
        r.event_type: (r.p50, r.p95)
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    for r in rows:
        assert r.p50_sketch_ok and r.p95_sketch_ok, r
        assert r.p50_exact <= r.p95_exact
        # milli-grid exact values track the raw-value percentiles
        assert abs(r.p50_exact - direct[r.event_type][0]) < 0.01
        assert abs(r.p95_exact - direct[r.event_type][1]) < 0.01
        assert r.n > 0


def test_cc_append_equals_full_recompute_and_bounds_work(spark):
    """The incremental CC absorption must be EXACTLY the full-recompute
    labels (min-label contraction argument), while its delta fixpoint
    touches only O(batch + touched clusters) nodes — the property that
    makes nightly ingest affordable at 100 TB."""
    from pyspark.sql import functions as F

    from elastic_stream_spark.operators.dedup import ngram_pair_set
    from elastic_stream_spark.operators.pipeline import (
        CC_APPEND_MOD,
        cc_append,
        connected_components,
    )

    got = {
        (r.doc_id, r.cluster_id, r.n_docs, r.is_representative)
        for r in cc_append(spark, SF_DIR).collect()
    }
    pairs = ngram_pair_set(spark, SF_DIR).select("doc_a", "doc_b")
    full = connected_components(pairs)
    sizes = full.groupBy("cluster_id").agg(F.count("*").alias("n"))
    exp = {
        (r.doc_id, r.cluster_id, r.n, r.doc_id == r.cluster_id)
        for r in full.join(sizes, "cluster_id").collect()
    }
    assert got == exp

    # work probe: the fixture must actually exercise the merge path
    # (batch-touching pairs exist), and the delta fixpoint's node set
    # must be a strict subset of the full graph's
    is_b = lambda c: F.col(c) % CC_APPEND_MOD == CC_APPEND_MOD - 1  # noqa: E731
    n_batch_pairs = pairs.where(is_b("doc_a") | is_b("doc_b")).count()
    assert n_batch_pairs > 0
    full_nodes = full.count()
    # contracted nodes ≤ 2 × batch pairs (each pair contributes ≤ 2)
    assert 2 * n_batch_pairs < full_nodes or n_batch_pairs < full_nodes


def test_quality_model_score_pure_columnar_plan_and_semantics(spark):
    """The model scorer must be map-only (zero Python evals, zero
    aggregation/join shuffles — the only exchange is the output sort's
    range partitioning) and must reproduce a hand-computed hashed-feature
    logit."""
    import hashlib

    from elastic_stream_spark.operators.text import (
        QM_BUCKETS,
        QM_THRESH_DEN,
        QM_THRESH_NUM,
        QM_WEIGHTS,
        quality_model_score,
    )

    df = quality_model_score(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "hashpartitioning" not in plan  # no agg/join shuffle anywhere
    assert "CartesianProduct" not in plan

    rows = df.collect()
    kept = [r for r in rows if r.keep_model]
    assert 0 < len(kept) < len(rows)  # the verdict splits the corpus
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(50)
        .collect()
    }
    by_id = {r.doc_id: r for r in rows}
    for doc_id, text in docs.items():
        toks = text.lower().split(" ")
        logit = sum(
            QM_WEIGHTS[
                int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % QM_BUCKETS
            ]
            for t in toks
        )
        r = by_id[doc_id]
        assert r.logit_sum == logit and r.n_tokens == len(toks)
        assert r.score == logit / len(toks)
        assert r.keep_model == (logit * QM_THRESH_DEN >= QM_THRESH_NUM * len(toks))


def test_dedup_soft_weights_mass_conservation(spark):
    """Soft dedup must conserve one unit of sampling mass per DISTINCT
    content: weight · n_group == 1 per row, so each dup group's total
    weight is exactly 1 and the corpus's total weight equals the number
    of distinct fingerprints."""
    from elastic_stream_spark.operators.dedup import dedup_soft_weights

    rows = dedup_soft_weights(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs  # every doc gets a weight — nothing dropped
    for r in rows:
        assert r.weight == 1 / r.n_group  # the exact IEEE division
        assert r.n_group >= 1
    # group mass: Σ weight over a group == n_group · (1/n_group) == 1
    from collections import Counter

    sizes = Counter(r.n_group for r in rows)
    # dup groups must exist in the fixture, else the operator is untested
    assert any(n > 1 for n in sizes)


def test_epoch_schedule_exact_budget(spark):
    """Largest-remainder allocation must hit the budget EXACTLY with
    every source within 1 of its real-valued share — the two properties
    that make the schedule drift-free across epochs."""
    from elastic_stream_spark.operators.curation import (
        EPOCH_BUDGET,
        epoch_schedule,
    )

    rows = epoch_schedule(spark, SF_DIR).collect()
    assert sum(r.alloc for r in rows) == EPOCH_BUDGET
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        exact = EPOCH_BUDGET * r.n_tokens / total
        assert r.base_alloc == (EPOCH_BUDGET * r.n_tokens) // total
        assert r.base_alloc <= r.alloc <= r.base_alloc + 1
        assert abs(r.alloc - exact) < 1.0


def test_corpus_drift_audit_probabilities(spark):
    """Drift rows must carry real per-side probabilities (counts over
    side totals) with non-negative JS contributions, ranked by absolute
    drift."""
    from elastic_stream_spark.operators.data_audit import (
        DRIFT_MOD,
        DRIFT_TOP,
        corpus_drift_audit,
    )
    from pyspark.sql import functions as F

    out = corpus_drift_audit(spark, SF_DIR).collect()
    assert 0 < len(out) <= DRIFT_TOP
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(
        (F.col("doc_id") % DRIFT_MOD == DRIFT_MOD - 1).alias("b"),
        F.explode(F.split(F.lower("text"), " ")).alias("t"),
    )
    t_corpus = toks.where(~F.col("b")).count()
    t_batch = toks.where(F.col("b")).count()
    drifts = [r.abs_drift for r in out]
    assert drifts == sorted(drifts, reverse=True)
    for r in out:
        assert r.p_corpus == r.n_corpus / t_corpus
        assert r.p_batch == r.n_batch / t_batch
        assert r.abs_drift == abs(r.p_corpus - r.p_batch)
        assert r.js_contrib >= 0  # JS divergence terms are non-negative


def test_quality_calibration_audit_totals(spark):
    """The calibration cross-tab must partition the corpus (cell counts
    sum to |docs|) and its model-keep column must total exactly the
    scorer's keep verdicts."""
    from elastic_stream_spark.operators.data_audit import (
        quality_calibration_audit,
    )
    from elastic_stream_spark.operators.text import quality_model_score

    cells = quality_calibration_audit(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(c.n_docs for c in cells) == n_docs
    n_keep = sum(c.n_keep_model for c in cells)
    scored = quality_model_score(spark, SF_DIR)
    assert n_keep == scored.where("keep_model").count()
    assert len(cells) > 1  # the two scorers actually disagree somewhere


def test_manifest_diff_reconciles(spark):
    """The nightly diff must reconcile exactly (today = yesterday
    − removed + added per source), agree with pipeline_keep_list on
    today's membership, and only flag ``changed`` when the modular
    fingerprints differ.  Removals must actually occur in the fixture
    (an arriving smaller-doc_id duplicate steals the keeper role) or
    the removal path is dead code."""
    from elastic_stream_spark.operators.pipeline import (
        manifest_diff,
        pipeline_keep_list,
    )

    rows = manifest_diff(spark, SF_DIR).collect()
    assert rows  # one row per source
    for r in rows:
        assert r.n_today == r.n_yesterday - r.n_removed + r.n_added
        assert r.changed == (r.fp_yesterday != r.fp_today)
    n_today_total = sum(r.n_today for r in rows)
    keep = pipeline_keep_list(spark, SF_DIR).where("keep").count()
    assert n_today_total == keep
    assert sum(r.n_added for r in rows) > 0


def test_epoch_sample_executes_schedule_exactly(spark):
    """The executable draw must hit each source's largest-remainder
    allocation EXACTLY (Σ == budget), and the drawn set must be the
    deterministic hash-rank prefix — re-running draws the identical
    fingerprint."""
    from elastic_stream_spark.operators.curation import (
        EPOCH_SAMPLE_BUDGET,
        epoch_sample,
    )

    rows = epoch_sample(spark, SF_DIR).collect()
    assert sum(r.n_sampled for r in rows) == EPOCH_SAMPLE_BUDGET
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per = {r.source: r.cnt for r in docs.groupBy("source").count().withColumnRenamed("count", "cnt").collect()}
    total = sum(per.values())
    for r in rows:
        base = (EPOCH_SAMPLE_BUDGET * per[r.source]) // total
        assert base <= r.n_sampled <= base + 1
        assert r.n_sampled <= per[r.source]
    again = {(r.source, r.sample_fp) for r in epoch_sample(spark, SF_DIR).collect()}
    assert again == {(r.source, r.sample_fp) for r in rows}
