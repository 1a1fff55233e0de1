"""Gate-registry invariants: the driver records correctness rows for the
first 50 registry entries only, so the order is load-bearing.

Round-12 policy (operators/__init__.py GATE_ORDER): the registry
(``len(GATE_ORDER)`` queries — 149 as of r12, now SATURATED: the
50-slot window / ≤3-round staleness arithmetic leaves 1 free slot in
r13 and 0 in r14/r15) ALTERNATES over ~3 rounds — a query may sit
beyond the window only if it was hash-green in a prior driver window
(r10 or r11); changed / never-checked queries always occupy a slot; the
47 queries whose last driver row was r9 take their policy-deadline
slots (staleness ≤ 3 rounds); the remaining 3 slots host the round's
NEW queries (the r11-staged audit operators).  Every query is
additionally re-verified each round by the committed strict
full-registry self-check at both sf.

Refactor convention (FP_TERM_MOD precedent, r10): code touches that
provably change neither the plan nor the output on the gate fixtures do
NOT preempt window slots; the full self-check covers them.  No r12 code
touch changes a registered query's plan or output (the KV / materialize
/ recall-probe work is off-gate), so r12 has no CHANGED re-entries.
"""

from __future__ import annotations

import json
import os

from elastic_stream_spark.operators import GATE_ORDER, all_oracles, all_queries

# New in round 12 — never driver-checked, so each must sit inside the
# window until it accumulates a green round.  Staged (built + oracled +
# pytest-verified) since r11 in operators/staged_r12.py.
NEW_R12 = {
    "retrieval_self_mrr",
    "dedup_cluster_density_audit",
    "stream_integrity_audit",
}

# Changed in round 12 — none: no r12 code touch alters a registered
# query's plan or output on the gate fixtures.
CHANGED_R12: set[str] = set()

# The 47 queries whose last driver row is CORRECTNESS_r09 (they sat out
# r10 and r11): round 12 is the ≤3-round staleness policy's deadline, so
# ALL of them must occupy window slots this round.
STALE_R9 = {
    "cc_append",
    "quality_model_score",
    "stream_pipeline_replay",
    "dedup_soft_weights",
    "quality_calibration_audit",
    "manifest_diff",
    "pipeline_end_to_end",
    "dedup_substring",
    "substring_scrub_stats",
    "pipeline_keep_list",
    "dedup_simhash",
    "dedup_exact",
    "asof_join_purchase_click",
    "list_resources",
    "sim_ann_ivf",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q14_promo_effect",
    "q19_brand_quantity_revenue",
    "fetch_range",
    "describe_streams",
    "list_ranges",
    "trim_fetch",
    "offset_accounting",
    "list_objects",
    "payload_decode",
    "sim_topk_bruteforce",
    "emb_label_centroids",
    "text_quality_score",
    "sim_ann_ivf_clustered",
    "q2_min_acctbal_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q22_global_sales_opportunity",
    "doc_chunking",
    "token_heavy_hitters",
    "text_pii_redact",
    "dedup_incremental",
    "chunk_dedup",
    "text_unigram_logprob",
    "ngram_counts",
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
    assert NEW_R12 <= window
    assert CHANGED_R12 <= window
    assert STALE_R9 <= window, (
        "r12 is the rotation policy's ≤3-round staleness deadline for the "
        f"r9-row queries; missing: {STALE_R9 - window}"
    )


def test_window_fills_remaining_slots_with_stalest_rows():
    """Alternation: after new/deadline queries claim their slots, every
    remaining window slot goes to a query whose last driver row is r9 —
    never to an r10/r11-green query while an r9-row query waits."""
    names = list(all_queries())
    window = names[:50]
    fresh = set(_load("CORRECTNESS_r10.json")) | set(_load("CORRECTNESS_r11.json"))
    fillers = [n for n in window if n not in NEW_R12 | CHANGED_R12 | STALE_R9]
    in_fresh = [n for n in fillers if n in fresh]
    assert not in_fresh, (
        f"window fillers that already have fresh r10/r11 rows: {in_fresh}"
    )


def test_beyond_window_queries_were_green_in_a_prior_window():
    """A query may sit beyond the window only if it carries a hash-green
    row from a prior driver window (r10 or r11 — the alternation cycle is
    ~3 rounds at the current registry size)."""
    names = list(all_queries())
    beyond = names[50:]
    green = _greens("CORRECTNESS_r10.json") | _greens("CORRECTNESS_r11.json")
    stragglers = [n for n in beyond if n not in green]
    assert not stragglers, (
        f"beyond-window queries without a prior green driver row: {stragglers}"
    )


def test_no_registry_query_older_than_three_rounds():
    """The staleness invariant itself: with the r12 window as planned, no
    registry query's most recent driver row may predate r10 (checked
    against the union of all committed driver artifacts, excluding the
    current window which gets fresh r12 rows)."""
    last: dict[str, int] = {}
    for r in range(1, 12):
        art = f"CORRECTNESS_r{r:02d}.json"
        try:
            rows = _load(art)
        except FileNotFoundError:
            continue
        for n in rows:
            last[n] = r
    names = list(all_queries())
    beyond = names[50:]
    too_old = [n for n in beyond if last.get(n, 0) < 10]
    assert not too_old, f"beyond-window queries with pre-r10 rows: {too_old}"


def test_every_query_has_an_oracle():
    """Since r6 every registry entry is hash-checkable (sim_ann_ivf —
    the former only rows-only row — probes every cell and carries the
    exact top-k oracle; the r7 serving form shares sim_ann_ivf_pq's)."""
    qs = all_queries()
    oracles = all_oracles()
    no_oracle = {n for n in qs if n not in oracles}
    assert no_oracle == set()
