"""Gate-registry invariants: the driver records correctness rows for the
first 50 registry entries only, so the order is load-bearing.

Round-10 policy (operators/__init__.py GATE_ORDER): the registry
(``len(GATE_ORDER)`` queries — 144 as of r10) is ~2.9 windows, so the
schedule ALTERNATES over ~3 rounds — a query may sit beyond the window
only if it was hash-green in a prior driver window (r8 or r9); changed /
never-checked queries always occupy a slot; the 40 queries whose last
driver row was r7 take their policy-deadline slots (staleness ≤ 3
rounds); the remaining slot tops up from the r8 pool (oldest-first).
Every query is additionally re-verified each round by the committed
strict full-registry self-check at both sf."""

from __future__ import annotations

import json
import os

from elastic_stream_spark.operators import GATE_ORDER, all_oracles, all_queries

# New in round 10 — never driver-checked, so each must sit inside the
# window until it accumulates a green round.
NEW_R10 = {
    "token_budget_trim",
    "epoch_coverage",
    "quality_threshold_sweep",
    "cross_source_dup_matrix",
    "lsh_band_audit",
    "corpus_novelty_curve",
}

# Changed in round 10 (r9 ADVICE items 2-4) — each needs a fresh driver
# row: epoch_schedule/epoch_sample rebuilt on the TakeOrdered Hamilton
# bonus (no unpartitioned window; epoch_schedule's output swaps rem_rank
# for rem); corpus_drift_audit gained the empty-side zero-measure guard.
CHANGED_R10 = {
    "epoch_schedule",
    "epoch_sample",
    "corpus_drift_audit",
}

# The 40 queries whose last driver row is CORRECTNESS_r07 (they sat out
# r8 and r9): round 10 is the ≤3-round staleness policy's deadline, so
# ALL of them must occupy window slots this round.
STALE_R7 = {
    "tfidf_topk_per_doc",
    "emb_covariance",
    "sim_ann_ivf_pq_served",
    "q21_waiting_supplier",
    "kv_range_scan",
    "sim_ann_ivf_pq",
    "q9_product_type_profit",
    "q12_priority_by_lateness",
    "q16_supplier_variety",
    "dedup_semantic",
    "stream_heavy_hitters_replay",
    "text_langid",
    "text_fingerprint",
    "top3_orders_per_customer",
    "running_revenue",
    "rollup_revenue",
    "semi_anti_customers",
    "setops_nations",
    "pivot_status_by_flag",
    "approx_distinct_parts",
    "above_avg_orders",
    "order_count_distribution",
    "top_balance_per_nation",
    "purchase_click_burst",
    "cube_revenue",
    "price_quantiles_by_flag",
    "acctbal_quartiles",
    "text_boilerplate",
    "pipeline_pack_sequences",
    "skew_salted_join_revenue",
    "decontaminate_ngrams",
    "mm_byte_features",
    "mm_frame_sample",
    "mm_metadata_stats",
    "tumbling_window_counts",
    "sliding_window_stats",
    "session_windows",
    "stream_dedup_events",
    "resource_latest_state",
    "offset_for_timestamp",
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


def test_changed_new_and_deadline_queries_inside_window():
    names = list(all_queries())
    window = set(names[:50])
    assert NEW_R10 <= window
    assert CHANGED_R10 <= window
    assert STALE_R7 <= window, (
        "r10 is the rotation policy's ≤3-round staleness deadline for the "
        f"r7-row queries; missing: {STALE_R7 - window}"
    )


def test_window_fills_remaining_slots_with_stalest_rows():
    """Alternation: after new/changed/deadline queries claim their slots,
    every remaining window slot goes to a query whose last driver row is
    r8 — never to an r9-green query while an r8-row query waits."""
    names = list(all_queries())
    window = names[:50]
    r9 = set(_load("CORRECTNESS_r09.json"))
    fillers = [n for n in window if n not in NEW_R10 | CHANGED_R10 | STALE_R7]
    in_r9 = [n for n in fillers if n in r9]
    assert not in_r9, f"window fillers that already have fresh r9 rows: {in_r9}"


def test_beyond_window_queries_were_green_in_a_prior_window():
    """A query may sit beyond the window only if it carries a hash-green
    row from a prior driver window (r8 or r9 — the alternation cycle is
    ~3 rounds at the current registry size)."""
    names = list(all_queries())
    beyond = names[50:]
    green = _greens("CORRECTNESS_r08.json") | _greens("CORRECTNESS_r09.json")
    stragglers = [n for n in beyond if n not in green]
    assert not stragglers, (
        f"beyond-window queries without a prior green driver row: {stragglers}"
    )


def test_no_registry_query_older_than_three_rounds():
    """The staleness invariant itself: with the r10 window as planned, no
    registry query's most recent driver row may predate r8 (checked
    against the union of all committed driver artifacts, excluding the
    current window which gets fresh r10 rows)."""
    last: dict[str, int] = {}
    for r in range(1, 10):
        art = f"CORRECTNESS_r{r:02d}.json"
        try:
            rows = _load(art)
        except FileNotFoundError:
            continue
        for n in rows:
            last[n] = r
    names = list(all_queries())
    beyond = names[50:]
    too_old = [n for n in beyond if last.get(n, 0) < 8]
    assert not too_old, f"beyond-window queries with pre-r8 rows: {too_old}"


def test_every_query_has_an_oracle():
    """Since r6 every registry entry is hash-checkable (sim_ann_ivf —
    the former only rows-only row — probes every cell and carries the
    exact top-k oracle; the r7 serving form shares sim_ann_ivf_pq's)."""
    qs = all_queries()
    oracles = all_oracles()
    no_oracle = {n for n in qs if n not in oracles}
    assert no_oracle == set()
