"""Staged r14 operator: cross-engine hash verification (the driver's
comparator, run here in-process) + structural invariants, so a future
registration — whenever a post-saturation slot frees — is a pure
GATE_ORDER wiring change on an already-verified surface (the protocol
that staged the r12 trio and the r13 audit)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def test_staged_r14_hash_matches_duckdb(spark):
    """The staged query must already pass the driver-style comparator
    (row count + schema kinds + canonical value hash) against its DuckDB
    oracle at ALL THREE committed scales — the registration claim is
    "already-verified surface", so the largest fixture is pinned here
    rather than left to a session log."""
    import sys

    sys.path.insert(0, "/root/repo")
    from elastic_stream_spark.operators.staged_r14 import (
        ORACLES_R14,
        QUERIES_R14,
    )
    from tools.compare import compare_one, duck_con

    oracles = ORACLES_R14()
    assert set(QUERIES_R14) == set(oracles)
    for sf_dir in (SF_DIR, "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        con = duck_con(sf_dir)
        try:
            for name, fn in QUERIES_R14.items():
                res = compare_one(name, fn, oracles[name], spark, con, sf_dir)
                assert res.get("status") == "OK", (sf_dir, res)
        finally:
            con.close()


def test_roundtrip_audit_invariants(spark):
    """On the committed fixture the layout must actually round-trip:
    every source all_ok, every document contiguous and length-exact,
    zero tiling violations — and the fragment count must equal the span
    manifest's row count (the audit reads the whole manifest, no
    silent truncation)."""
    from elastic_stream_spark.operators.curation import pack_doc_spans
    from elastic_stream_spark.operators.staged_r14 import (
        pack_loader_roundtrip_audit,
    )

    rows = pack_loader_roundtrip_audit(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.all_ok, r
        assert r.n_docs_contiguous == r.n_docs
        assert r.n_docs_length_ok == r.n_docs
        assert r.n_seq_tiling_violations == 0
        assert r.n_frags >= r.n_docs
        assert r.n_seqs >= 1
    assert sum(r.n_frags for r in rows) == pack_doc_spans(spark, SF_DIR).count()


def test_roundtrip_audit_catches_a_broken_manifest(spark, monkeypatch):
    """The audit must FAIL on a corrupted layout, not just pass on a
    good one: drop one fragment row from the manifest (a lost span) and
    both the contiguity and length checks must flag the victim doc."""
    from elastic_stream_spark.operators import curation
    from elastic_stream_spark.operators import staged_r14 as mod
    from pyspark.sql import functions as F

    real = curation.pack_doc_spans
    good = real(spark, SF_DIR)
    # victim: a doc with >1 fragment; drop its LAST fragment (tail loss
    # keeps the chain contiguous, so only the length check can catch
    # it) — run once more dropping a MIDDLE one (chain check catches)
    multi = (
        good.groupBy("source", "doc_id")
        .agg(F.count("*").alias("nf"), F.max("seq").alias("last"))
        .where(F.col("nf") >= 2)
        .limit(1)
        .collect()[0]
    )

    def broken(spark_, sf_dir_):
        df = real(spark_, sf_dir_)
        return df.where(
            ~(
                (F.col("source") == multi.source)
                & (F.col("doc_id") == multi.doc_id)
                & (F.col("seq") == multi.last)
            )
        )

    monkeypatch.setattr(curation, "pack_doc_spans", broken)
    rows = {r.source: r for r in mod.pack_loader_roundtrip_audit(spark, SF_DIR).collect()}
    victim = rows[multi.source]
    assert not victim.all_ok
    assert victim.n_docs_length_ok == victim.n_docs - 1
