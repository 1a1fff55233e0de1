"""Gate-registry invariants: the driver records correctness rows for the
first 50 registry entries only, so the order is load-bearing.

Round-7 policy (operators/__init__.py GATE_ORDER): the registry (108
queries) exceeds the 50-row window, so the schedule ALTERNATES — a query
may sit beyond the window only if it was hash-green in the immediately
preceding driver window; changed / never-checked queries always occupy a
slot.  Every query is additionally re-verified each round by the
committed strict full-registry self-check at both sf."""

from __future__ import annotations

import json
import os

from elastic_stream_spark.operators import GATE_ORDER, all_oracles, all_queries

# Changed in round 7 — each needs a fresh driver row, so each must sit
# inside the window: q21 swapped its double-countDistinct profile for a
# pair-level pre-aggregation (Expand removed); the KV store was sharded
# (kv_range_scan reads through the new manifest layout); ivf_pq_topk was
# refactored for the build/serve split (sim_ann_ivf_pq shares the path).
CHANGED_R7 = {
    "q21_waiting_supplier",
    "kv_range_scan",
    "sim_ann_ivf_pq",
}

# New in round 7 — never driver-checked, so each must sit inside the
# window until it accumulates a green round.
NEW_R7 = {
    "sim_ann_ivf_pq_served",
    "dedup_substring",
    "dedup_incremental",
    "source_ngram_overlap",
}

# r7-late additions that landed after the 50-row window was already
# fully claimed by never-checked/changed queries: queued immediately
# below the boundary on strict full-gate evidence
# (CORRECTNESS_FULL_r07*.json), promised a window slot in r8 — the same
# queue-then-rotate path QUEUED_FROM_R6 took.
NEW_QUEUED_R8 = {
    "source_cap_sample",
    "emb_random_project",
    "corpus_split_shards",
    "quality_buckets",
    "emb_quantize_int8",
    "substring_scrub_stats",
    "mix_temperature_weights",
    "bm25_search",
    "bigram_pmi",
    "event_funnel",
    "stream_join_replay",
    "split_leakage_check",
    "emb_norm_outliers",
    "neardup_lookup",
    "window_unique_users",
    "retention_cohorts",
    "dedup_containment",
    "neardup_lookup_served",
    # late-r7 tranche 2: hybrid retrieval / filtered ANN, time-series
    # gap-fill + rolling + transitions, and the data-audit family
    "hybrid_rrf_search",
    "filtered_vector_search",
    "ts_gapfill_locf",
    "rolling_revenue_7d",
    "event_transitions",
    "key_skew_audit",
    "column_profile",
    "fuzzy_name_match",
    "daily_anomaly_zscore",
    "rfm_segments",
    "winsorized_event_stats",
    "scd2_user_history",
    "pit_feature_join",
    "jsonl_roundtrip_audit",
}

# Never driver-checked before r7: the six r6-late corpus-prep queries,
# queued from r6 beyond the then-full window on strict full-gate
# evidence (the promised NEW_QUEUED_R7 rotation — r6 VERDICT item 1).
QUEUED_FROM_R6 = {
    "chunk_dedup",
    "text_unigram_logprob",
    "vocab_coverage",
    "ngram_counts",
    "tfidf_topk_per_doc",
    "emb_covariance",
}

# First (and only) driver rows in r6 — kept inside the window for a
# second consecutive green round before they start alternating.
# (sim_ann_ivf was displaced beyond the boundary by the three r7
# additions — policy-clean since it is r6-green, and its IVF machinery
# keeps in-window coverage via sim_ann_ivf_pq / sim_ann_ivf_pq_served.)
SINGLE_GREEN_R6 = {
    "q9_product_type_profit",
    "q12_priority_by_lateness",
    "q16_supplier_variety",
    "dedup_semantic",
    "stream_heavy_hitters_replay",
}


def _load(artifact: str) -> dict:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, artifact)) as f:
        return json.load(f)


def _greens(artifact: str) -> set[str]:
    """Queries hash-green in a committed driver artifact."""
    return {n for n, row in _load(artifact).items() if row.get("hash_match")}


def test_registry_matches_gate_order():
    qs = all_queries()
    assert list(qs) == GATE_ORDER
    assert len(qs) == len(set(qs))


def test_changed_and_new_queries_inside_window():
    names = list(all_queries())
    window = set(names[:50])
    assert CHANGED_R7 <= window
    assert NEW_R7 <= window
    assert QUEUED_FROM_R6 <= window
    assert SINGLE_GREEN_R6 <= window


def test_stale_queries_rotated_into_window():
    """Alternation: every query whose last driver row is r5 (it sat out
    the r6 window) must be back inside the r7 window — no query's driver
    row is ever more than two rounds old."""
    names = list(all_queries())
    window = set(names[:50])
    r5 = _greens("CORRECTNESS_r05.json")
    r6 = set(_load("CORRECTNESS_r06.json"))
    stale = (r5 - r6) & set(names)
    missing = stale - window
    assert not missing, f"r5-stale queries left beyond the window: {missing}"


def test_beyond_window_queries_were_green_last_round():
    """A query may sit beyond the window only if it was hash-green in
    the immediately preceding driver window — the freshest row a
    rotated-out query can have."""
    names = list(all_queries())
    beyond = names[50:]
    r6_green = _greens("CORRECTNESS_r06.json")
    stragglers = [n for n in beyond if n not in r6_green and n not in NEW_QUEUED_R8]
    assert not stragglers, (
        f"beyond-window queries without an r6-green driver row: {stragglers}"
    )


def test_queued_r8_sit_at_window_boundary():
    """The r7-late additions must head the beyond-window region (so the
    r8 rotation is a pure block swap) until they earn a driver row."""
    names = list(all_queries())
    assert set(names[50 : 50 + len(NEW_QUEUED_R8)]) == NEW_QUEUED_R8


def test_every_query_has_an_oracle():
    """Since r6 every registry entry is hash-checkable (sim_ann_ivf —
    the former only rows-only row — probes every cell and carries the
    exact top-k oracle; the r7 serving form shares sim_ann_ivf_pq's)."""
    qs = all_queries()
    oracles = all_oracles()
    no_oracle = {n for n in qs if n not in oracles}
    assert no_oracle == set()
