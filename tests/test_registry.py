"""Gate-registry invariants: the driver records correctness rows for the
first 50 registry entries only, so the order is load-bearing."""

from __future__ import annotations

import json
import os

from elastic_stream_spark.operators import GATE_ORDER, all_oracles, all_queries

# Rows-only-by-design entries (honest-approximate, no SQL oracle): they
# can never hash-match, so the window policy requires them to sit BEYOND
# the 50-row gate window — an err row must not occupy a slot a
# hash-checkable query could use.
ROWS_ONLY_BY_DESIGN = {"sim_ann_ivf"}

# Changed in round 5 (fixed oracles, new IVF oracles, ADVICE code
# changes) — each needs a fresh driver row, so each must sit inside the
# window.
CHANGED_R5 = {
    "text_boilerplate",
    "pipeline_pack_sequences",
    "pipeline_sample_mix",
    "text_pii_redact",
    "sim_ann_ivf_clustered",
    "sim_ann_ivf_pq",
    "dedup_ngram_jaccard",
    "skew_salted_join_revenue",
}

# New in round 5 — never driver-checked, so each must sit inside the
# window until it accumulates green rounds.
NEW_R5 = {
    "q2_min_acctbal_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q22_global_sales_opportunity",
    "doc_chunking",
    "token_heavy_hitters",
    "source_distinctive_tokens",
}

# Landed after the r5 window filled: beyond the window THIS round on the
# strength of the committed strict full-gate artifact, and required to
# rotate INTO the window in r6 (first driver exposure).
NEW_QUEUED_R6 = {
    "q9_product_type_profit",
    "q12_priority_by_lateness",
    "q16_supplier_variety",
    "q21_waiting_supplier",
}


def _greens(*artifacts: str) -> set[str]:
    """Queries hash-green in EVERY named committed driver artifact."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    greens: set[str] | None = None
    for r in artifacts:
        with open(os.path.join(here, r)) as f:
            rows = json.load(f)
        g = {n for n, row in rows.items() if row.get("hash_match")}
        greens = g if greens is None else greens & g
    return greens or set()


def test_registry_matches_gate_order():
    qs = all_queries()
    assert list(qs) == GATE_ORDER
    assert len(qs) == len(set(qs))


def test_changed_queries_inside_window():
    names = list(all_queries())
    window = set(names[:50])
    assert CHANGED_R5 <= window
    assert NEW_R5 <= window


def test_no_rows_only_entries_inside_window():
    names = list(all_queries())
    window = set(names[:50])
    oracles = all_oracles()
    no_oracle_in_window = {n for n in window if n not in oracles}
    assert not no_oracle_in_window, (
        f"rows-only queries occupy gate slots: {no_oracle_in_window}"
    )


def test_beyond_window_queries_have_two_green_rounds():
    """Everything beyond the window must have been hash-green in the last
    two driver rounds (r3 AND r4) — stable, never-failed queries — except
    the documented rows-only-by-design set and the NEW_QUEUED_R6 tranche,
    which instead must be hash-green in the committed strict full-gate
    artifact (its driver exposure is scheduled for the r6 window)."""
    names = list(all_queries())
    beyond = names[50:]
    greens = _greens("CORRECTNESS_r03.json", "CORRECTNESS_r04.json")
    queued_greens = _greens("CORRECTNESS_FULL_r05.json")
    stragglers = [
        n
        for n in beyond
        if n not in ROWS_ONLY_BY_DESIGN
        and (
            n not in queued_greens if n in NEW_QUEUED_R6 else n not in greens
        )
    ]
    assert not stragglers, (
        f"beyond-window queries without required green evidence: {stragglers}"
    )
    assert NEW_QUEUED_R6 <= set(beyond)


def test_every_query_has_oracle_or_documented_exemption():
    qs = all_queries()
    oracles = all_oracles()
    no_oracle = {n for n in qs if n not in oracles}
    assert no_oracle == ROWS_ONLY_BY_DESIGN
