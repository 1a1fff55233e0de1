"""Gate-registry invariants: the driver records correctness rows for the
first 50 registry entries only, so the order is load-bearing.

Round-8 policy (operators/__init__.py GATE_ORDER): the registry (125
queries) is ~2.5 windows, so the schedule ALTERNATES over ~3 rounds — a
query may sit beyond the window only if it was hash-green in a prior
driver window (r6 or r7); changed / never-checked queries always occupy
a slot, and the remaining slots go to the stalest driver rows.  Every
query is additionally re-verified each round by the committed strict
full-registry self-check at both sf."""

from __future__ import annotations

import json
import os

from elastic_stream_spark.operators import GATE_ORDER, all_oracles, all_queries

# New in round 8 — never driver-checked, so it must sit inside the
# window until it accumulates a green round: the composed end-to-end
# curation pipeline (verdict -> split/shard -> pack -> manifest).
NEW_R8 = {
    "pipeline_end_to_end",
    # late-r8: cross-boundary packing spans, group-aware source split,
    # survivorship merge
    "pack_doc_spans",
    "corpus_split_by_source",
    "dedup_survivorship",
    "approx_quantile_audit",
}

# Changed in round 8 — the rounding-tie sweep (r7 VERDICT item 2 +
# ADVICE): published ratios of integers moved from round(a/b, k) to the
# UNROUNDED exact-integer division with oracles updated in lockstep;
# winsorized_event_stats was reworked onto an exact milli-cent integer
# grid; daily_anomaly_zscore gained the degenerate-case (n_days <= 1 or
# var = 0) NULL guard; pipeline_curation_verdict's oracle repetition
# flag dropped its rounds to match the unrounded Spark side.  Each needs
# a fresh driver row, so each must sit inside the window.
CHANGED_R8 = {
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_containment",
    "neardup_lookup",
    "neardup_lookup_served",
    "substring_scrub_stats",
    "event_gaps_lag",
    "event_funnel",
    "key_skew_audit",
    "column_profile",
    "winsorized_event_stats",
    "daily_anomaly_zscore",
    "source_distinctive_tokens",
    "vocab_coverage",
    "source_ngram_overlap",
    "text_token_stats",
    "pipeline_sample_mix",
    "text_repetition",
    "mix_temperature_weights",
    "pipeline_curation_verdict",
    # late-r8: q1's avg_qty moved to the unrounded exact-int division
    "q1_pricing_summary",
}

# The r7-late additions (NEW_QUEUED_R8 in the r7 tree): never
# driver-checked, queued below the then-full r7 window on strict
# full-gate evidence (CORRECTNESS_FULL_r07*.json, 124/124 both sf) with
# a promised r8 window slot.  Ten of them are ALSO in CHANGED_R8 (the
# rounding sweep touched them); the other 22 rotate in unchanged.
QUEUED_R8 = {
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
    assert NEW_R8 <= window
    assert CHANGED_R8 <= window
    assert QUEUED_R8 <= window, (
        "the r7-late additions were promised an r8 window slot "
        f"(r7 VERDICT item 1); missing: {QUEUED_R8 - window}"
    )


def test_window_fills_remaining_slots_with_stalest_rows():
    """Alternation: after new/changed/queued claim their slots, every
    remaining window slot goes to a query whose last driver row is r6
    (it sat out the r7 window) — never to an r7-green query while an
    r6-row query waits."""
    names = list(all_queries())
    window = names[:50]
    r7 = set(_load("CORRECTNESS_r07.json"))
    fillers = [
        n for n in window if n not in NEW_R8 | CHANGED_R8 | QUEUED_R8
    ]
    in_r7 = [n for n in fillers if n in r7]
    assert not in_r7, f"window fillers that already have fresh r7 rows: {in_r7}"


def test_beyond_window_queries_were_green_in_a_prior_window():
    """A query may sit beyond the window only if it carries a hash-green
    row from a prior driver window (r6 or r7 — at 125 queries the
    alternation cycle is ~3 rounds)."""
    names = list(all_queries())
    beyond = names[50:]
    green = _greens("CORRECTNESS_r06.json") | _greens("CORRECTNESS_r07.json")
    stragglers = [n for n in beyond if n not in green]
    assert not stragglers, (
        f"beyond-window queries without a prior green driver row: {stragglers}"
    )


def test_every_query_has_an_oracle():
    """Since r6 every registry entry is hash-checkable (sim_ann_ivf —
    the former only rows-only row — probes every cell and carries the
    exact top-k oracle; the r7 serving form shares sim_ann_ivf_pq's)."""
    qs = all_queries()
    oracles = all_oracles()
    no_oracle = {n for n in qs if n not in oracles}
    assert no_oracle == set()
