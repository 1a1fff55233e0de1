"""Gate-registry invariants: the driver records correctness rows for the
first 50 registry entries only, so the order is load-bearing.

Round-6 policy (operators/__init__.py GATE_ORDER): the registry (88
queries) exceeds the 50-row window, so the schedule ALTERNATES — a query
may sit beyond the window only if it was hash-green in the immediately
preceding driver window; changed / never-checked queries always occupy a
slot.  Every query is additionally re-verified each round by the
committed strict full-registry self-check at both sf."""

from __future__ import annotations

import json
import os

from elastic_stream_spark.operators import GATE_ORDER, all_oracles, all_queries

# Changed in round 6 (eager-persist materialization of the dedup-family
# intermediates, numpy probe path for IVF/PQ, exact exhaustive-probe
# sim_ann_ivf with its new oracle, session-memo re-keying) — each needs
# a fresh driver row, so each must sit inside the window.
# dedup_clusters / pipeline_keep_list close the r5 ADVICE gap: their
# execution changed in r5 (session memos) without a fresh driver row.
CHANGED_R6 = {
    "sim_ann_ivf",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "sim_ann_ivf_clustered",
    "sim_ann_ivf_pq",
    "pipeline_curation_verdict",
    "dedup_clusters",
    "pipeline_keep_list",
}

# New in round 6 — never driver-checked, so each must sit inside the
# window until it accumulates a green round.
NEW_R6 = {
    "dedup_semantic",
    "stream_heavy_hitters_replay",
}

# Never driver-checked before r6: the third TPC-H tranche, queued from
# r5 beyond the then-full window on strict full-gate evidence.
QUEUED_FROM_R5 = {
    "q9_product_type_profit",
    "q12_priority_by_lateness",
    "q16_supplier_variety",
    "q21_waiting_supplier",
}

# Landed after the r6 window filled: beyond the window THIS round on the
# strength of the committed strict full-gate artifacts (regenerated to
# include them), required to rotate INTO the window in r7.
NEW_QUEUED_R7 = {
    "chunk_dedup",
    "text_unigram_logprob",
    "vocab_coverage",
    "ngram_counts",
    "tfidf_topk_per_doc",
    "emb_covariance",
}


def _greens(artifact: str) -> set[str]:
    """Queries hash-green in a committed driver artifact."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, artifact)) as f:
        rows = json.load(f)
    return {n for n, row in rows.items() if row.get("hash_match")}


def test_registry_matches_gate_order():
    qs = all_queries()
    assert list(qs) == GATE_ORDER
    assert len(qs) == len(set(qs))


def test_changed_and_new_queries_inside_window():
    names = list(all_queries())
    window = set(names[:50])
    assert CHANGED_R6 <= window
    assert NEW_R6 <= window
    assert QUEUED_FROM_R5 <= window


def test_stale_queries_rotated_into_window():
    """Alternation: every query whose last driver row is r4 (it sat out
    the r5 window) must be back inside the r6 window — no query's driver
    row is ever more than two rounds old."""
    names = list(all_queries())
    window = set(names[:50])
    r4 = _greens("CORRECTNESS_r04.json")
    r5 = set(
        json.load(
            open(
                os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "CORRECTNESS_r05.json",
                )
            )
        )
    )
    stale = (r4 - r5) & set(names)
    missing = stale - window
    assert not missing, f"r4-stale queries left beyond the window: {missing}"


def test_beyond_window_queries_were_green_last_round():
    """A query may sit beyond the window only if it was hash-green in
    the immediately preceding driver window — the freshest row a
    rotated-out query can have — except the NEW_QUEUED_R7 tranche, which
    instead must be hash-green in BOTH committed strict full-gate
    artifacts (its driver exposure is scheduled for the r7 window)."""
    names = list(all_queries())
    beyond = names[50:]
    r5_green = _greens("CORRECTNESS_r05.json")
    full_green = _greens("CORRECTNESS_FULL_r06.json") & _greens(
        "CORRECTNESS_FULL_r06_sf01.json"
    )
    stragglers = [
        n
        for n in beyond
        if (n not in full_green if n in NEW_QUEUED_R7 else n not in r5_green)
    ]
    assert not stragglers, (
        f"beyond-window queries without required green evidence: {stragglers}"
    )
    assert NEW_QUEUED_R7 <= set(beyond)


def test_every_query_has_an_oracle():
    """Since r6 every registry entry is hash-checkable: sim_ann_ivf —
    the former only rows-only row — probes every cell and carries the
    exact top-k oracle."""
    qs = all_queries()
    oracles = all_oracles()
    no_oracle = {n for n in qs if n not in oracles}
    assert no_oracle == set()
