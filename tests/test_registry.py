"""Gate-registry invariants: the driver records correctness rows for the
first 50 registry entries only, so the order is load-bearing."""

from __future__ import annotations

from elastic_stream_spark.operators import GATE_ORDER, all_oracles, all_queries

# r3 dark set: queries that had no CORRECTNESS_r03 row (VERDICT.md,
# "What's missing" #1) — must sit inside the 50-row window until they
# accumulate green driver rounds.
NEVER_CHECKED_R3 = {
    "decontaminate_ngrams",
    "text_boilerplate",
    "pipeline_pack_sequences",
    "pipeline_sample_mix",
    "text_pii_redact",
    "mm_frame_sample",
    "mm_byte_features",
    "mm_metadata_stats",
    "tumbling_window_counts",
    "sliding_window_stats",
    "session_windows",
    "stream_dedup_events",
}


def test_registry_matches_gate_order():
    qs = all_queries()
    assert list(qs) == GATE_ORDER
    assert len(qs) == len(set(qs))


def test_dark_set_has_prior_green_rounds():
    names = list(all_queries())
    window, beyond = set(names[:50]), names[50:]
    assert NEVER_CHECKED_R3 <= window
    # everything beyond the window must have been hash-green in the last
    # two driver rounds (r2 AND r3) — i.e. stable, never-failed queries
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    greens = None
    for r in ("CORRECTNESS_r02.json", "CORRECTNESS_r03.json"):
        with open(os.path.join(here, r)) as f:
            rows = json.load(f)
        g = {n for n, row in rows.items() if row.get("hash_match")}
        greens = g if greens is None else greens & g
    stragglers = [n for n in beyond if n not in greens]
    assert not stragglers, f"beyond-window queries without 2 green rounds: {stragglers}"


def test_every_query_has_oracle_or_documented_exemption():
    qs = all_queries()
    oracles = all_oracles()
    no_oracle = {n for n in qs if n not in oracles}
    # approximate ops exempt by design (rows-only check)
    assert no_oracle == {
        "sim_ann_ivf",
        "sim_ann_ivf_clustered",
        "sim_ann_ivf_pq",
    }
