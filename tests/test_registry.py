"""Gate-registry invariants: the driver records correctness rows for the
first 50 registry entries only, so the order is load-bearing.

Round-9 policy (operators/__init__.py GATE_ORDER): the registry
(``len(GATE_ORDER)`` queries — 138 as of r9) is ~2.8 windows, so the
schedule ALTERNATES over ~3 rounds — a query may sit beyond the window
only if it was hash-green in a prior driver window (r7 or r8); changed /
never-checked queries always occupy a slot; the 34 queries whose last
driver row was r6 take their policy-deadline slots (staleness ≤ 3
rounds); the remaining slots go to r7-row queries.  Every query is
additionally re-verified each round by the committed strict
full-registry self-check at both sf."""

from __future__ import annotations

import json
import os

from elastic_stream_spark.operators import GATE_ORDER, all_oracles, all_queries

# New in round 9 — never driver-checked, so each must sit inside the
# window until it accumulates a green round: incremental CC absorption,
# the model-based (hashed-feature linear) quality scorer, and the
# streaming incremental-nightly pipeline replay.
NEW_R9 = {
    "cc_append",
    "quality_model_score",
    "stream_pipeline_replay",
    # second r9 batch: soft-dedup reweighting, epoch sample allocation,
    # corpus drift audit, scorer calibration cross-tab, manifest diff
    "dedup_soft_weights",
    "epoch_schedule",
    "epoch_sample",
    "corpus_drift_audit",
    "quality_calibration_audit",
    "manifest_diff",
}

# Changed in round 9 — each needs a fresh driver row:
# - pipeline_end_to_end composed the group-aware (source-hashed,
#   leakage-safe) split gate (r8 VERDICT "what's wrong" #3);
# - dedup_substring / substring_scrub_stats carry the redesigned
#   bounded-working-set span extraction (r8 VERDICT next-round #2).
CHANGED_R9 = {
    "pipeline_end_to_end",
    "dedup_substring",
    "substring_scrub_stats",
}

# The 34 queries whose last driver row is CORRECTNESS_r06 (they sat out
# r7 and r8): round 9 is the ≤3-round staleness policy's own deadline,
# so ALL of them must occupy window slots this round (r8 VERDICT
# next-round #1).
STALE_R6 = {
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
    assert NEW_R9 <= window
    assert CHANGED_R9 <= window
    assert STALE_R6 <= window, (
        "r9 is the rotation policy's ≤3-round staleness deadline for the "
        f"r6-row queries; missing: {STALE_R6 - window}"
    )


def test_window_fills_remaining_slots_with_stalest_rows():
    """Alternation: after new/changed/deadline queries claim their slots,
    every remaining window slot goes to a query whose last driver row is
    r7 — never to an r8-green query while an r7-row query waits."""
    names = list(all_queries())
    window = names[:50]
    r8 = set(_load("CORRECTNESS_r08.json"))
    fillers = [n for n in window if n not in NEW_R9 | CHANGED_R9 | STALE_R6]
    in_r8 = [n for n in fillers if n in r8]
    assert not in_r8, f"window fillers that already have fresh r8 rows: {in_r8}"


def test_beyond_window_queries_were_green_in_a_prior_window():
    """A query may sit beyond the window only if it carries a hash-green
    row from a prior driver window (r7 or r8 — the alternation cycle is
    ~3 rounds at the current registry size)."""
    names = list(all_queries())
    beyond = names[50:]
    green = _greens("CORRECTNESS_r07.json") | _greens("CORRECTNESS_r08.json")
    stragglers = [n for n in beyond if n not in green]
    assert not stragglers, (
        f"beyond-window queries without a prior green driver row: {stragglers}"
    )


def test_no_registry_query_older_than_three_rounds():
    """The staleness invariant itself: with the r9 window as planned, no
    registry query's most recent driver row may predate r7 (checked
    against the union of all committed driver artifacts, excluding the
    current window which gets fresh r9 rows)."""
    last: dict[str, int] = {}
    for r in range(1, 9):
        art = f"CORRECTNESS_r{r:02d}.json"
        try:
            rows = _load(art)
        except FileNotFoundError:
            continue
        for n in rows:
            last[n] = r
    names = list(all_queries())
    beyond = names[50:]
    too_old = [n for n in beyond if last.get(n, 0) < 7]
    assert not too_old, f"beyond-window queries with pre-r7 rows: {too_old}"


def test_every_query_has_an_oracle():
    """Since r6 every registry entry is hash-checkable (sim_ann_ivf —
    the former only rows-only row — probes every cell and carries the
    exact top-k oracle; the r7 serving form shares sim_ann_ivf_pq's)."""
    qs = all_queries()
    oracles = all_oracles()
    no_oracle = {n for n in qs if n not in oracles}
    assert no_oracle == set()
