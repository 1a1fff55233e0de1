"""Gate-registry invariants: the driver records correctness rows for the
first 50 registry entries only, so the order is load-bearing.

Round-11 policy (operators/__init__.py GATE_ORDER): the registry
(``len(GATE_ORDER)`` queries — 146 as of r11, growing by the ~2-3/round
the 50-slot window / ≤3-round staleness arithmetic allows) ALTERNATES
over ~3 rounds — a query may sit beyond the window only if it was
hash-green in a prior driver window (r9 or r10); changed /
never-checked queries always occupy a slot; the 47 queries whose last
driver row was r8 take their policy-deadline slots (staleness ≤ 3
rounds); the remaining 2 slots host the round's NEW queries.  Every
query is additionally re-verified each round by the committed strict
full-registry self-check at both sf.

Refactor convention (FP_TERM_MOD precedent, r10): code touches that
provably change neither the plan nor the output on the gate fixtures
(the r11 Hamilton empty-corpus guard — empty-input-only path; the IVF
``spill`` parameter — defaults reproduce the r10 argmax/no-dedup code
byte-for-byte) do NOT preempt window slots; the full self-check covers
them.  Plan or output changes DO: epoch_coverage (literal-bound
WindowGroupLimit prune) re-enters the window this round.
"""

from __future__ import annotations

import json
import os

from elastic_stream_spark.operators import GATE_ORDER, all_oracles, all_queries

# New in round 11 — never driver-checked, so each must sit inside the
# window until it accumulates a green round.
NEW_R11 = {
    "pack_fragmentation_audit",
    "curriculum_mix_allocation",
}

# Changed in round 11 — needs a fresh driver row: epoch_coverage's
# ranked draw gained the literal ``max_alloc`` pre-bound (restores the
# map-side WindowGroupLimit prune the per-source column bound defeats;
# r10 VERDICT item 3).  Hash unchanged, plan changed.
CHANGED_R11 = {
    "epoch_coverage",
}

# The 47 queries whose last driver row is CORRECTNESS_r08 (they sat out
# r9 and r10): round 11 is the ≤3-round staleness policy's deadline, so
# ALL of them must occupy window slots this round.
STALE_R8 = {
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
    assert NEW_R11 <= window
    assert CHANGED_R11 <= window
    assert STALE_R8 <= window, (
        "r11 is the rotation policy's ≤3-round staleness deadline for the "
        f"r8-row queries; missing: {STALE_R8 - window}"
    )


def test_window_fills_remaining_slots_with_stalest_rows():
    """Alternation: after changed/deadline queries claim their slots,
    every remaining window slot goes to a query whose last driver row is
    r9 — never to an r10-green query while an r9-row query waits."""
    names = list(all_queries())
    window = names[:50]
    r10 = set(_load("CORRECTNESS_r10.json"))
    fillers = [n for n in window if n not in NEW_R11 | CHANGED_R11 | STALE_R8]
    in_r10 = [n for n in fillers if n in r10]
    assert not in_r10, f"window fillers that already have fresh r10 rows: {in_r10}"


def test_beyond_window_queries_were_green_in_a_prior_window():
    """A query may sit beyond the window only if it carries a hash-green
    row from a prior driver window (r9 or r10 — the alternation cycle is
    ~3 rounds at the current registry size)."""
    names = list(all_queries())
    beyond = names[50:]
    green = _greens("CORRECTNESS_r09.json") | _greens("CORRECTNESS_r10.json")
    stragglers = [n for n in beyond if n not in green]
    assert not stragglers, (
        f"beyond-window queries without a prior green driver row: {stragglers}"
    )


def test_no_registry_query_older_than_three_rounds():
    """The staleness invariant itself: with the r11 window as planned, no
    registry query's most recent driver row may predate r9 (checked
    against the union of all committed driver artifacts, excluding the
    current window which gets fresh r11 rows)."""
    last: dict[str, int] = {}
    for r in range(1, 11):
        art = f"CORRECTNESS_r{r:02d}.json"
        try:
            rows = _load(art)
        except FileNotFoundError:
            continue
        for n in rows:
            last[n] = r
    names = list(all_queries())
    beyond = names[50:]
    too_old = [n for n in beyond if last.get(n, 0) < 9]
    assert not too_old, f"beyond-window queries with pre-r9 rows: {too_old}"


def test_every_query_has_an_oracle():
    """Since r6 every registry entry is hash-checkable (sim_ann_ivf —
    the former only rows-only row — probes every cell and carries the
    exact top-k oracle; the r7 serving form shares sim_ann_ivf_pq's)."""
    qs = all_queries()
    oracles = all_oracles()
    no_oracle = {n for n in qs if n not in oracles}
    assert no_oracle == set()
