"""Gate-registry invariants: the driver records correctness rows for the
first 50 registry entries only, so the order is load-bearing.

Round-14 policy (operators/__init__.py GATE_ORDER): the registry
(``len(GATE_ORDER)`` queries — 150, saturated since r13: the 50-slot
window / ≤3-round staleness arithmetic leaves 0 free slots) ALTERNATES
over exactly 3 rounds — a query may sit beyond the window only if it
was hash-green in a prior driver window (r12 or r13); changed /
never-checked queries always occupy a slot; the 50 queries whose last
driver row was r11 take ALL 50 policy-deadline slots this round
(staleness ≤ 3 rounds), so r14 has no free slot and no NEW entries.
Every query is additionally re-verified each round by the committed
strict full-registry self-check at both sf.

Refactor convention (FP_TERM_MOD precedent, r10): code touches that
provably change neither the plan nor the output on the gate fixtures do
NOT preempt window slots; the full self-check covers them.  No r14 code
touch changes a registered query's plan or output (the KV paging /
migration / canary work is off-gate), so r14 has no CHANGED re-entries.
"""

from __future__ import annotations

import json
import os

from elastic_stream_spark.operators import GATE_ORDER, all_oracles, all_queries

# New in round 14 — none: the registry is saturated (zero free slots);
# the staged candidates (pack_loader_roundtrip_audit,
# curriculum_ramp_drift_audit) stay queued in operators/staged_r14/r15.
NEW_R14: set[str] = set()

# Changed in round 14 — none: the KV boundary-manifest paging and
# migrate_layout work is storage-format-internal (hypothesis
# equivalence property pins observational equivalence; kv_range_scan
# builds its store fresh per run), and the bench canary is off-gate.
CHANGED_R14: set[str] = set()

# The 50 queries whose last driver row is CORRECTNESS_r11 (they sat out
# r12 and r13): round 14 is the ≤3-round staleness policy's deadline, so
# ALL of them must occupy window slots this round.
STALE_R11 = {
    "pack_fragmentation_audit",
    "curriculum_mix_allocation",
    "epoch_coverage",
    "corpus_split_by_source",
    "dedup_survivorship",
    "approx_quantile_audit",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_containment",
    "neardup_lookup",
    "neardup_lookup_served",
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
    "source_cap_sample",
    "emb_random_project",
    "corpus_split_shards",
    "quality_buckets",
    "emb_quantize_int8",
    "bm25_search",
    "bigram_pmi",
    "stream_join_replay",
    "split_leakage_check",
    "emb_norm_outliers",
    "window_unique_users",
    "retention_cohorts",
    "hybrid_rrf_search",
    "filtered_vector_search",
    "ts_gapfill_locf",
    "rolling_revenue_7d",
    "event_transitions",
    "fuzzy_name_match",
    "rfm_segments",
    "scd2_user_history",
    "pit_feature_join",
    "jsonl_roundtrip_audit",
    "dedup_embedding_lsh",
    "dedup_clusters",
    "q1_pricing_summary",
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


def test_new_changed_and_deadline_queries_inside_window():
    names = list(all_queries())
    window = set(names[:50])
    assert NEW_R14 <= window
    assert CHANGED_R14 <= window
    assert STALE_R11 <= window, (
        "r14 is the rotation policy's ≤3-round staleness deadline for the "
        f"r11-row queries; missing: {STALE_R11 - window}"
    )


def test_window_fills_remaining_slots_with_stalest_rows():
    """Alternation: after new/deadline queries claim their slots, every
    remaining window slot goes to a query whose last driver row is r11 —
    never to an r12/r13-green query while an r11-row query waits.  (In
    r14 the deadline class claims all 50 slots, so fillers must be
    empty.)"""
    names = list(all_queries())
    window = names[:50]
    fresh = set(_load("CORRECTNESS_r12.json")) | set(_load("CORRECTNESS_r13.json"))
    fillers = [n for n in window if n not in NEW_R14 | CHANGED_R14 | STALE_R11]
    in_fresh = [n for n in fillers if n in fresh]
    assert not in_fresh, (
        f"window fillers that already have fresh r12/r13 rows: {in_fresh}"
    )


def test_beyond_window_queries_were_green_in_a_prior_window():
    """A query may sit beyond the window only if it carries a hash-green
    row from a prior driver window (r12 or r13 — the alternation cycle is
    exactly 3 rounds at the saturated registry size)."""
    names = list(all_queries())
    beyond = names[50:]
    green = _greens("CORRECTNESS_r12.json") | _greens("CORRECTNESS_r13.json")
    stragglers = [n for n in beyond if n not in green]
    assert not stragglers, (
        f"beyond-window queries without a prior green driver row: {stragglers}"
    )


def test_no_registry_query_older_than_three_rounds():
    """The staleness invariant itself: with the r14 window as planned, no
    registry query's most recent driver row may predate r12 (checked
    against the union of all committed driver artifacts, excluding the
    current window which gets fresh r14 rows)."""
    last: dict[str, int] = {}
    for r in range(1, 14):
        art = f"CORRECTNESS_r{r:02d}.json"
        try:
            rows = _load(art)
        except FileNotFoundError:
            continue
        for n in rows:
            last[n] = r
    names = list(all_queries())
    beyond = names[50:]
    too_old = [n for n in beyond if last.get(n, 0) < 12]
    assert not too_old, f"beyond-window queries with pre-r12 rows: {too_old}"


def test_every_query_has_an_oracle():
    """Since r6 every registry entry is hash-checkable (sim_ann_ivf —
    the former only rows-only row — probes every cell and carries the
    exact top-k oracle; the r7 serving form shares sim_ann_ivf_pq's)."""
    qs = all_queries()
    oracles = all_oracles()
    no_oracle = {n for n in qs if n not in oracles}
    assert no_oracle == set()
