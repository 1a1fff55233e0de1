"""Gate-registry invariants: the driver records correctness rows for the
first 50 registry entries only, so the order is load-bearing.

Round-13 policy (operators/__init__.py GATE_ORDER): the registry
(``len(GATE_ORDER)`` queries — 150 as of r13, the saturation plateau:
the 50-slot window / ≤3-round staleness arithmetic leaves 0 free slots
in r14 and r15) ALTERNATES over ~3 rounds — a query may sit beyond the
window only if it was hash-green in a prior driver window (r11 or r12);
changed / never-checked queries always occupy a slot; the 49 queries
whose last driver row was r10 take their policy-deadline slots
(staleness ≤ 3 rounds); the one remaining slot hosts the round's NEW
query (the r12-staged attention-waste audit).  Every query is
additionally re-verified each round by the committed strict
full-registry self-check at both sf.

Refactor convention (FP_TERM_MOD precedent, r10): code touches that
provably change neither the plan nor the output on the gate fixtures do
NOT preempt window slots; the full self-check covers them.  No r13 code
touch changes a registered query's plan or output (the KV span-scan /
bench / fsync work is off-gate), so r13 has no CHANGED re-entries.
"""

from __future__ import annotations

import json
import os

from elastic_stream_spark.operators import GATE_ORDER, all_oracles, all_queries

# New in round 13 — never driver-checked, so it must sit inside the
# window until it accumulates a green round.  Staged (built + oracled +
# pytest-verified) since r12 in operators/staged_r13.py.
NEW_R13 = {
    "pack_attention_waste_audit",
}

# Changed in round 13 — none: no r13 code touch alters a registered
# query's plan or output on the gate fixtures.
CHANGED_R13: set[str] = set()

# The 49 queries whose last driver row is CORRECTNESS_r10 (they sat out
# r11 and r12): round 13 is the ≤3-round staleness policy's deadline, so
# ALL of them must occupy window slots this round.
STALE_R10 = {
    "token_budget_trim",
    "quality_threshold_sweep",
    "cross_source_dup_matrix",
    "lsh_band_audit",
    "corpus_novelty_curve",
    "epoch_schedule",
    "epoch_sample",
    "corpus_drift_audit",
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
    "pack_doc_spans",
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
    assert NEW_R13 <= window
    assert CHANGED_R13 <= window
    assert STALE_R10 <= window, (
        "r13 is the rotation policy's ≤3-round staleness deadline for the "
        f"r10-row queries; missing: {STALE_R10 - window}"
    )


def test_window_fills_remaining_slots_with_stalest_rows():
    """Alternation: after new/deadline queries claim their slots, every
    remaining window slot goes to a query whose last driver row is r10 —
    never to an r11/r12-green query while an r10-row query waits."""
    names = list(all_queries())
    window = names[:50]
    fresh = set(_load("CORRECTNESS_r11.json")) | set(_load("CORRECTNESS_r12.json"))
    fillers = [n for n in window if n not in NEW_R13 | CHANGED_R13 | STALE_R10]
    in_fresh = [n for n in fillers if n in fresh]
    assert not in_fresh, (
        f"window fillers that already have fresh r11/r12 rows: {in_fresh}"
    )


def test_beyond_window_queries_were_green_in_a_prior_window():
    """A query may sit beyond the window only if it carries a hash-green
    row from a prior driver window (r11 or r12 — the alternation cycle is
    ~3 rounds at the current registry size)."""
    names = list(all_queries())
    beyond = names[50:]
    green = _greens("CORRECTNESS_r11.json") | _greens("CORRECTNESS_r12.json")
    stragglers = [n for n in beyond if n not in green]
    assert not stragglers, (
        f"beyond-window queries without a prior green driver row: {stragglers}"
    )


def test_no_registry_query_older_than_three_rounds():
    """The staleness invariant itself: with the r13 window as planned, no
    registry query's most recent driver row may predate r11 (checked
    against the union of all committed driver artifacts, excluding the
    current window which gets fresh r13 rows)."""
    last: dict[str, int] = {}
    for r in range(1, 13):
        art = f"CORRECTNESS_r{r:02d}.json"
        try:
            rows = _load(art)
        except FileNotFoundError:
            continue
        for n in rows:
            last[n] = r
    names = list(all_queries())
    beyond = names[50:]
    too_old = [n for n in beyond if last.get(n, 0) < 11]
    assert not too_old, f"beyond-window queries with pre-r11 rows: {too_old}"


def test_every_query_has_an_oracle():
    """Since r6 every registry entry is hash-checkable (sim_ann_ivf —
    the former only rows-only row — probes every cell and carries the
    exact top-k oracle; the r7 serving form shares sim_ann_ivf_pq's)."""
    qs = all_queries()
    oracles = all_oracles()
    no_oracle = {n for n in qs if n not in oracles}
    assert no_oracle == set()
