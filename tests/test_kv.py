"""KV store: etcd-style Range/Put/DeleteRange/Txn semantics
(rpc.fbs:780-931) incl. the CAS one-winner property (FIXTURES.md C.8)."""

from __future__ import annotations

from elastic_stream_spark.kv import Compare, KVStore, prefix_end


def test_put_get_version(workdir):
    kv = KVStore(workdir)
    v1 = kv.put(b"a", b"1")
    v2 = kv.put(b"a", b"2")
    assert v2 > v1
    assert kv.get(b"a") == (b"2", v2)
    assert kv.get(b"missing") is None


def test_range_scan_prefix_and_limit(workdir):
    kv = KVStore(workdir)
    for k in [b"app/1", b"app/2", b"app/3", b"zoo/1"]:
        kv.put(k, b"v")
    items, more = kv.range(b"app/", prefix_end(b"app/"))
    assert [k for k, _, _ in items] == [b"app/1", b"app/2", b"app/3"]
    assert not more
    items, more = kv.range(b"app/", prefix_end(b"app/"), limit=2)
    assert [k for k, _, _ in items] == [b"app/1", b"app/2"] and more
    # from-key convention: everything >= key
    items, _ = kv.range(b"app/3", KVStore.FROM_KEY)
    assert [k for k, _, _ in items] == [b"app/3", b"zoo/1"]
    # point get
    items, _ = kv.range(b"app/2")
    assert [k for k, _, _ in items] == [b"app/2"]


def test_prefix_end_edge_cases():
    assert prefix_end(b"a") == b"b"
    assert prefix_end(b"a\xff") == b"b"
    assert prefix_end(b"\xff") == b""  # whole keyspace


def test_delete_range(workdir):
    kv = KVStore(workdir)
    for k in [b"a", b"b", b"c", b"d"]:
        kv.put(k, b"v")
    assert kv.delete_range(b"b", b"d") == 2  # [b, d) → b, c
    items, _ = kv.range(b"", KVStore.FROM_KEY)
    assert [k for k, _, _ in items] == [b"a", b"d"]


def test_txn_compare_success_failure(workdir):
    kv = KVStore(workdir)
    kv.put(b"k", b"v1")
    ok, res = kv.txn(
        compare=[Compare(b"k", "value", "==", b"v1")],
        success=[("put", b"k", b"v2"), ("get", b"k")],
        failure=[("put", b"k", b"lost")],
    )
    assert ok and res[1][0] == b"v2"
    ok, _ = kv.txn(
        compare=[Compare(b"k", "value", "==", b"v1")],  # stale now
        success=[("put", b"k", b"v3")],
        failure=[("get", b"k")],
    )
    assert not ok
    assert kv.get(b"k")[0] == b"v2"  # failure branch didn't clobber


def test_cas_single_winner(workdir):
    """FIXTURES.md C.8: N conditional puts on the same version — exactly
    one wins."""
    kv = KVStore(workdir)
    v = kv.put(b"leader", b"node0")
    outcomes = [kv.cas(b"leader", v, f"node{i}".encode()) for i in range(1, 6)]
    assert outcomes.count(True) == 1
    assert outcomes[0] is True  # first CAS saw the fresh version
    # create-if-absent: version 0 means key must not exist
    assert kv.cas(b"new", 0, b"x") is True
    assert kv.cas(b"new", 0, b"y") is False


def test_to_df(spark, workdir):
    kv = KVStore(workdir)
    kv.put(b"a", b"1")
    kv.put(b"b", b"2")
    df = kv.to_df(spark)
    assert df.count() == 2
    assert sorted(bytes(r.key) for r in df.collect()) == [b"a", b"b"]


def test_prefix_scan_over_all_ff_keys(workdir):
    """prefix_end(b"\\xff") = b"" (no byte string sorts above the
    prefix): the open-upper-bound sentinel must mean "all keys >= key"
    in Range/DeleteRange/Txn-delete — previously it matched nothing and
    such scans silently returned/deleted zero keys (review finding;
    etcd maps this case to the same from-key semantics)."""
    kv = KVStore(workdir)
    kv.put(b"\xfe", b"below")
    kv.put(b"\xff\x01", b"v1")
    kv.put(b"\xff\xff", b"v2")
    end = prefix_end(b"\xff")
    assert end == b""
    items, more = kv.range(b"\xff", end)
    assert [k for k, _, _ in items] == [b"\xff\x01", b"\xff\xff"]
    assert not more
    # txn delete over the same span
    ok, _ = kv.txn([], [("delete", b"\xff\xff", b"")])
    assert ok and kv.get(b"\xff\xff") is None
    assert kv.delete_range(b"\xff", end) == 1
    assert kv.get(b"\xfe") is not None


def test_sharded_layout_and_point_ops(workdir):
    """Puts land in per-bucket generation files + a manifest — never a
    monolithic snapshot (r6 ADVICE item 2: O(keyspace) per put).  The
    point paths (get / point-range) read exactly one bucket."""
    import os

    kv = KVStore(workdir)
    for i in range(200):
        kv.put(f"k{i:04d}".encode(), f"v{i}".encode())
    files = os.listdir(workdir)
    assert "kv-meta.json" in files
    assert any(f.startswith("kv-shard-") for f in files)
    assert "kv.json" not in files
    # every key readable; versions monotone with insertion order
    assert kv.get(b"k0000")[0] == b"v0"
    assert kv.get(b"k0199")[0] == b"v199"
    assert kv.get(b"k0199")[1] > kv.get(b"k0000")[1]
    # full scan sees all keys in key order
    items, more = kv.range(b"k", prefix_end(b"k"))
    assert len(items) == 200 and not more
    assert items[0][0] == b"k0000" and items[-1][0] == b"k0199"
    # one generation file per populated bucket — replaced generations GC'd
    shard_files = [f for f in files if f.startswith("kv-shard-")]
    buckets = {f.split(".")[0] for f in shard_files}
    assert len(shard_files) == len(buckets)


def test_legacy_monolithic_snapshot_migrates(workdir):
    """A pre-shard ``kv.json`` reads transparently and is migrated to the
    sharded layout by the first write transaction."""
    import base64
    import json
    import os

    enc = lambda b: base64.b64encode(b).decode()
    legacy = {
        "revision": 7,
        "data": {
            enc(b"a"): {"value": enc(b"1"), "version": 3},
            enc(b"b"): {"value": enc(b"2"), "version": 7},
        },
    }
    with open(os.path.join(workdir, "kv.json"), "w") as f:
        json.dump(legacy, f)
    kv = KVStore(workdir)
    # reads see the legacy content, at the legacy versions
    assert kv.get(b"a") == (b"1", 3)
    items, _ = kv.range(b"a", KVStore.FROM_KEY)
    assert [k for k, _, _ in items] == [b"a", b"b"]
    # first write migrates: revision continues from 7, kv.json is gone
    rev = kv.put(b"c", b"3")
    assert rev == 8
    assert not os.path.exists(os.path.join(workdir, "kv.json"))
    assert kv.get(b"a") == (b"1", 3) and kv.get(b"c") == (b"3", 8)


def test_multi_bucket_txn_atomic_after_crash_window(workdir):
    """Crash between shard-generation writes and the manifest commit
    must leave the store unchanged (orphan generation files are swept by
    the next OPEN's first commit — a crash kills the writing process, so
    the next committer is necessarily a fresh handle; r11 moved the
    O(nshards) listdir sweep off the per-commit path) — the manifest
    rename is THE commit point."""
    import os

    kv = KVStore(workdir)
    kv.put(b"a", b"1")
    kv.put(b"b", b"2")
    # simulate the crash window: a new generation file exists for some
    # bucket but no manifest references it (the writer then died)
    orphan = os.path.join(workdir, "kv-shard-00.999999999999.json")
    with open(orphan, "w") as f:
        f.write('{"bogus": {"value": "eA==", "version": 999}}')
    kv2 = KVStore(workdir)  # post-crash open
    assert kv2.get(b"a") == (b"1", 1)  # reads resolve via manifest only
    kv2.put(b"c", b"3")  # the fresh open's first commit sweeps the orphan
    assert not os.path.exists(orphan)
    assert kv2.get(b"c")[1] == 3


def test_adaptive_reshard_grows_buckets_and_preserves_data(workdir):
    """Once the keyspace crosses KV_RESHARD_AT entries/bucket on
    average, committing txns grow the bucket count by linear-hashing
    splits (r12; the r11 wholesale rewrite made the trigger put pay the
    whole keyspace — 3.5 s at 524k keys).  A bulk load catches up fully
    inside its own commit; data, versions, range scans, and point reads
    must all survive the rehash, including from a FRESH store handle
    (the (nshards, next) pair travels in the manifest, not the
    object)."""
    import json
    import os

    from elastic_stream_spark.kv import (
        KV_RESHARD_AT,
        KV_RESHARD_FACTOR,
        KV_SHARDS,
    )

    kv = KVStore(workdir)
    n = KV_RESHARD_AT * KV_SHARDS + 7  # just past the trigger
    with kv._txn() as st:
        for i in range(n):
            st.set_entry(f"k:{i:07d}".encode(), b"v%d" % i)
    with open(os.path.join(workdir, "kv-meta.json")) as f:
        meta = json.load(f)
    eff = meta["nshards"] + meta["next"] * (KV_RESHARD_FACTOR - 1)
    assert eff > KV_SHARDS  # grew past the base round
    assert n < KV_RESHARD_AT * eff  # caught up: occupancy back under trigger
    assert meta["n"] == n
    # reads (fresh handle — manifest-driven hashing)
    kv2 = KVStore(workdir)
    assert kv2.get(b"k:0000000") == (b"v0", 1)
    assert kv2.get(b"k:%07d" % (n - 1))[0] == b"v%d" % (n - 1)
    items, _ = kv2.range(b"k:0000000", prefix_end(b"k:000000"))
    assert len(items) == 10  # k:0000000 .. k:0000009
    # post-reshard writes land in the resharded layout and stay visible
    rev = kv2.put(b"k:0000000", b"updated")
    assert kv2.get(b"k:0000000") == (b"updated", rev)
    # delete_range still spans the whole (resharded) keyspace
    deleted = kv2.delete_range(b"k:0000001", prefix_end(b"k:000000"))
    assert deleted == 9
    assert kv2.get(b"k:0000005") is None
    with open(os.path.join(workdir, "kv-meta.json")) as f:
        meta2 = json.load(f)
    assert meta2["n"] == n - 9


def test_split_commits_are_incremental(workdir):
    """The r11 VERDICT flagged the wholesale reshard's trigger put (it
    rewrote the entire keyspace: 876 ms at 131k keys, 3.5 s at 524k).
    Under linear hashing a SINGLE put's commit may rewrite at most: its
    own bucket + one split (the parent and its ≤FACTOR-1 fresh children)
    — pin that bound structurally by diffing the manifest's generation
    map across every put while growing through a split trigger."""
    import json
    import os

    from elastic_stream_spark.kv import KV_RESHARD_AT, KV_RESHARD_FACTOR

    kv = KVStore(workdir)
    # preload to just under the first trigger (256 buckets x 512)
    n = KV_RESHARD_AT * 256 - 2
    with kv._txn() as st:
        for i in range(n):
            st.set_entry(f"k:{i:07d}".encode(), b"v")

    def gens() -> dict:
        with open(os.path.join(workdir, "kv-meta.json")) as f:
            m = json.load(f)
        return m, dict(m["shards"])

    meta0, prev = gens()
    assert meta0["next"] == 0  # still pre-split
    split_seen = 0
    for i in range(8):  # crosses the trigger within the first few puts
        kv.put(f"grow:{i}".encode(), b"v")
        meta, cur = gens()
        changed = {b for b in cur if cur.get(b) != prev.get(b)}
        changed |= set(prev) - set(cur)
        # bound: the put's own bucket + parent + (FACTOR-1) children
        assert len(changed) <= 1 + KV_RESHARD_FACTOR, (i, sorted(changed))
        if meta["next"] > meta0["next"]:
            split_seen += 1
        prev = cur
    assert split_seen >= 1  # the trigger actually fired inside the loop
    # and the data survived the splits
    assert kv.get(b"k:0000000") == (b"v", 1)
    assert kv.get(b"grow:0") is not None


def test_failed_commit_rearms_orphan_sweep(workdir):
    """r11 ADVICE: the orphan sweep latched once per open, so a commit
    that died AFTER writing shard generations but BEFORE the manifest
    swap leaked those files for the rest of a long-lived process.  Crash
    a commit mid-way by injecting a manifest-write failure, then verify:
    the store still serves the pre-crash state (rename is the commit
    point), the orphan generation files exist, and the SAME handle's
    next successful commit — not just a fresh open — reclaims them."""
    import os

    kv = KVStore(workdir)
    kv.put(b"a", b"1")
    kv.put(b"b", b"2")
    assert kv._swept  # the open's first commit ran its sweep

    real_write = kv._write_file

    def exploding_write(name, payload):
        if name == "kv-meta.json":
            raise OSError("disk full (injected)")
        real_write(name, payload)

    kv._write_file = exploding_write
    try:
        kv.put(b"c", b"3")
    except OSError:
        pass
    else:
        raise AssertionError("injected failure did not propagate")
    finally:
        kv._write_file = real_write

    # rename-is-commit-point: the failed put is invisible...
    assert kv.get(b"c") is None
    assert kv.get(b"a") == (b"1", 1)
    # ...but its shard generation was written and is now an orphan,
    # and the failure re-armed the sweep
    orphans = {
        fn
        for fn in os.listdir(workdir)
        if fn.startswith("kv-shard-")
        and fn not in {
            KVStore._shard_filename(b, g)
            for b, g in kv._read_meta()["shards"].items()
        }
    }
    assert orphans
    assert not kv._swept
    kv.put(b"d", b"4")  # same handle's next commit sweeps
    live = {
        KVStore._shard_filename(b, g)
        for b, g in kv._read_meta()["shards"].items()
    }
    for fn in orphans:
        assert fn not in live and not os.path.exists(os.path.join(workdir, fn))
    # the crashed txn's revision bump never committed, so the next
    # successful mutation takes revision 3 — no gap in the committed
    # revision sequence
    assert kv.get(b"d") == (b"4", 3)


def test_occupancy_tracks_trigger_under_organic_growth(workdir):
    """The split budget (one bucket per KV_RESHARD_AT inserted entries,
    min 1 per commit) must keep pace with single-put organic growth:
    after EVERY commit the average occupancy may exceed the trigger by
    at most the entries one commit can add before its own split lands.
    With shrunken constants, grow through several full rounds and check
    the invariant at each step."""
    import json
    import os

    import elastic_stream_spark.kv as kvmod

    saved = (kvmod.KV_SHARDS, kvmod.KV_RESHARD_AT, kvmod.KV_MAX_SHARDS)
    kvmod.KV_SHARDS, kvmod.KV_RESHARD_AT, kvmod.KV_MAX_SHARDS = 4, 4, 256
    try:
        kv = KVStore(workdir)
        for i in range(600):  # 4 buckets -> well past two x4 rounds
            kv.put(f"k:{i:05d}".encode(), b"v")
            with open(os.path.join(workdir, "kv-meta.json")) as f:
                meta = json.load(f)
            eff = meta["nshards"] + meta["next"] * (
                kvmod.KV_RESHARD_FACTOR - 1
            )
            assert meta["n"] <= kvmod.KV_RESHARD_AT * eff + 1, (
                i,
                meta["n"],
                eff,
            )
        assert meta["nshards"] >= 64  # really crossed >= 2 round boundaries
        # data integrity after hundreds of splits
        assert kv.get(b"k:00000") == (b"v", 1)
        assert kv.get(b"k:00599") is not None
    finally:
        kvmod.KV_SHARDS, kvmod.KV_RESHARD_AT, kvmod.KV_MAX_SHARDS = saved


def test_cross_process_cas_serializes(workdir):
    """The linearizability claim (kv.py module docstring: transactions
    serialize through the driver-side fcntl lock, the same
    single-coordinator role as the reference's etcd-leader PD) tested
    ACROSS PROCESSES: 4 workers bump a shared counter 40 times each via
    CAS-retry.  Every increment must land exactly once (no lost
    updates), and the revision must reflect exactly the successful
    mutations."""
    import json
    import multiprocessing as mp
    import os

    N_PROCS, N_INCR = 4, 40

    def worker(root: str, n: int) -> None:
        kv = KVStore(root)
        for _ in range(n):
            while True:
                got = kv.get(b"counter")
                cur, ver = (int(got[0]), got[1]) if got else (0, 0)
                if kv.cas(b"counter", ver, str(cur + 1).encode()):
                    break

    ctx = mp.get_context("fork")
    procs = [
        ctx.Process(target=worker, args=(workdir, N_INCR))
        for _ in range(N_PROCS)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
        assert p.exitcode == 0
    kv = KVStore(workdir)
    val, ver = kv.get(b"counter")
    assert int(val) == N_PROCS * N_INCR  # no lost update, no double-apply
    with open(os.path.join(workdir, "kv-meta.json")) as f:
        meta = json.load(f)
    # exactly one revision per successful CAS (failed CAS txns are
    # read-only and must not bump the revision)
    assert meta["revision"] == N_PROCS * N_INCR == ver


def test_readers_resolve_during_concurrent_splits(workdir):
    """Lock-free point reads stay consistent while a concurrent writer
    grows the store through split triggers: the reader must always
    resolve (manifest-churn retry) and never see a missing or stale
    value for keys written before it started."""
    import multiprocessing as mp

    from elastic_stream_spark.kv import KV_RESHARD_AT

    kv = KVStore(workdir)
    base = KV_RESHARD_AT * 256 - 50  # just under the first split trigger
    with kv._txn() as st:
        for i in range(base):
            st.set_entry(f"k:{i:07d}".encode(), b"v")

    def writer(root: str) -> None:
        w = KVStore(root)
        for i in range(300):  # crosses several split commits
            w.put(f"grow:{i:04d}".encode(), b"g")

    def reader(root: str, q) -> None:
        r = KVStore(root)
        try:
            for i in range(600):
                k = f"k:{(i * 131) % base:07d}".encode()
                got = r.get(k)
                assert got is not None and got[0] == b"v", k
            q.put("ok")
        except BaseException as e:  # surfaced to the asserting parent
            q.put(f"reader failed: {e!r}")

    ctx = mp.get_context("fork")
    q = ctx.Queue()
    pw = ctx.Process(target=writer, args=(workdir,))
    pr = ctx.Process(target=reader, args=(workdir, q))
    pr.start(); pw.start()
    pw.join(120); pr.join(120)
    assert pw.exitcode == 0 and pr.exitcode == 0
    assert q.get(timeout=10) == "ok"
    meta = kv._read_meta()
    assert meta.get("next", 0) > 0  # the writer really split mid-read


def test_reshard_crash_window_leaves_store_unchanged(workdir):
    """A crash AFTER the reshard wrote its new-generation bucket files
    but BEFORE the manifest swap must leave the store serving the old
    generation unchanged; the next open's first commit sweeps the
    orphaned new-generation files."""
    import json
    import os

    from elastic_stream_spark.kv import KVStore as KV

    kv = KV(workdir)
    for i in range(20):
        kv.put(f"k:{i:03d}".encode(), b"v%d" % i)
    with open(os.path.join(workdir, "kv-meta.json")) as f:
        meta_before = json.load(f)
    # simulate the reshard crash window: new-nshards generation files on
    # disk, manifest still pointing at the old generation
    for b in ("001", "3ff", "fff"):
        with open(os.path.join(workdir, f"kv-shard-{b}.000000099999.json"), "w") as f:
            f.write('{"bogus": {"value": "eA==", "version": 9}}')
    kv2 = KV(workdir)  # post-crash open
    assert kv2.get(b"k:000") == (b"v0", 1)
    items, _ = kv2.range(b"k:", prefix_end(b"k:"))
    assert len(items) == 20  # snapshot resolves via the old manifest only
    kv2.put(b"k:020", b"new")  # first commit sweeps the orphans
    for b in ("001", "3ff", "fff"):
        assert not os.path.exists(
            os.path.join(workdir, f"kv-shard-{b}.000000099999.json")
        )
    with open(os.path.join(workdir, "kv-meta.json")) as f:
        meta_after = json.load(f)
    assert meta_after["nshards"] == meta_before.get("nshards", 256)
    assert meta_after["n"] == 21


# ---------------------------------------------------------------- ordered
# Opt-in ordered (range-partitioned) layout, r13: span scans must read
# only the overlapping buckets instead of the whole keyspace (the hash
# layout's one O(keyspace) op class — r12 VERDICT "what's wrong" item 2).


def _apply_ops(kv: KVStore):
    """One op sequence exercised identically on both layouts."""
    for i in range(40):
        kv.put(f"app/{i:03d}".encode(), f"v{i}".encode())
    kv.put(b"app/007", b"overwritten")
    kv.delete_range(b"app/030", b"app/035")
    kv.txn(
        compare=[Compare(b"app/001", "exists", "==", True)],
        success=[("put", b"cas/won", b"yes")],
    )
    out = {
        "prefix": kv.range(b"app/00", prefix_end(b"app/00"))[0],
        "limited": kv.range(b"app/", prefix_end(b"app/"), limit=7),
        "from_key": kv.range(b"app/036", KVStore.FROM_KEY)[0],
        "point": kv.range(b"app/007")[0],
        "get": kv.get(b"app/012"),
        "missing": kv.get(b"app/031"),
    }
    # versions differ only if op ordering diverged; strip them for the
    # cross-layout comparison but keep relative structure
    return {
        k: [(it[0], it[1]) for it in v] if isinstance(v, list) else v
        for k, v in out.items()
        if k not in ("limited", "get", "missing")
    }, out


def test_ordered_layout_semantics_match_hash(workdir):
    """The layout is a storage choice, not an API change: an identical
    op sequence must produce identical results on both layouts."""
    h = KVStore(workdir + "/hash")
    o = KVStore(workdir + "/ordered", layout="ordered")
    rh, full_h = _apply_ops(h)
    ro, full_o = _apply_ops(o)
    assert rh == ro
    assert [it[:2] for it in full_h["limited"][0]] == [
        it[:2] for it in full_o["limited"][0]
    ]
    assert full_h["limited"][1] == full_o["limited"][1]  # `more` flag
    assert full_h["get"][0] == full_o["get"][0]
    assert full_h["missing"] is None and full_o["missing"] is None


def test_ordered_layout_splits_balance_and_preserve_data(workdir):
    """Bulk-loading past the per-bucket threshold must median-split into
    multiple buckets with strictly ascending boundaries, every key still
    readable, and no bucket left oversize."""
    import json as _json
    import os as _os

    from elastic_stream_spark.kv import KV_RESHARD_AT

    kv = KVStore(workdir, layout="ordered")
    n = 10_000
    with kv._txn() as st:
        for i in range(n):
            st.set_entry(f"k:{i:06d}".encode(), b"v")
    with open(_os.path.join(workdir, "kv-meta.json")) as f:
        meta = _json.load(f)
    assert meta["layout"] == "ordered"
    assert len(meta["oranges"]) >= 8  # 10k keys / (2*512) cap → ≥ 9 leaves
    # boundaries strictly ascending, last open
    uppers = [u for _, u in meta["oranges"]]
    assert uppers[-1] is None
    decoded = [KVStore._dec(u) for u in uppers[:-1]]
    assert decoded == sorted(decoded) and len(set(decoded)) == len(decoded)
    # no bucket oversize; union of buckets is exactly the keyspace
    seen = 0
    for b, gen in meta["shards"].items():
        with open(_os.path.join(workdir, KVStore._shard_filename(b, gen))) as f:
            data = _json.load(f)
        assert len(data) <= 2 * KV_RESHARD_AT
        seen += len(data)
    assert seen == n
    # point reads across the whole range
    for i in (0, 1, 4_999, 5_000, 9_999):
        assert kv.get(f"k:{i:06d}".encode()) is not None
    # full scan ordered and complete
    items, _ = kv.range(b"k:", prefix_end(b"k:"))
    assert len(items) == n
    assert [k for k, _, _ in items] == sorted(k for k, _, _ in items)


def test_ordered_span_scan_reads_only_overlapping_buckets(workdir, monkeypatch):
    """THE point of the layout: a narrow prefix scan at a grown keyspace
    touches O(selectivity) bucket files, not O(keyspace) — the hash
    layout structurally reads every bucket for the same scan."""
    kv = KVStore(workdir, layout="ordered")
    with kv._txn() as st:
        for i in range(10_000):
            st.set_entry(f"k:{i:06d}".encode(), b"v")
    n_buckets = len(kv._read_meta()["shards"])
    assert n_buckets >= 8
    reads: list[str] = []
    orig = KVStore._read_bucket_file

    def counting(self, meta, b):
        reads.append(b)
        return orig(self, meta, b)

    monkeypatch.setattr(KVStore, "_read_bucket_file", counting)
    # 10-key span out of 10k
    items, _ = kv.range(b"k:00001", prefix_end(b"k:00001"))
    assert [k for k, _, _ in items] == [
        f"k:{i:06d}".encode() for i in range(10, 20)
    ]
    assert len(reads) <= 2, (
        f"narrow span read {len(reads)} of {n_buckets} buckets: {reads}"
    )
    # pruned DeleteRange too
    reads.clear()
    assert kv.delete_range(b"k:00002", prefix_end(b"k:00002")) == 10
    assert len(reads) <= 2
    # hash layout contrast: the same scan must read every bucket
    hv = KVStore(workdir + "/hash")
    with hv._txn() as st:
        for i in range(2_000):
            st.set_entry(f"k:{i:06d}".encode(), b"v")
    n_hash_buckets = len(hv._read_meta()["shards"])
    reads.clear()
    hv.range(b"k:00001", prefix_end(b"k:00001"))
    assert len(reads) == n_hash_buckets


def test_ordered_layout_survives_reopen_and_skewed_keys(workdir):
    """The manifest's layout field is authoritative on reopen (default
    constructor arg must NOT flip an ordered store back to hash), and
    median splits self-balance keys sharing a long common prefix — the
    skew that breaks static prefix sharding."""
    kv = KVStore(workdir, layout="ordered")
    with kv._txn() as st:
        for i in range(5_000):
            st.set_entry(f"streams/very/common/prefix/{i:06d}".encode(), b"v")
    # reopen with the DEFAULT arg: layout comes from the manifest
    kv2 = KVStore(workdir)
    meta = kv2._read_meta()
    assert meta["layout"] == "ordered"
    from elastic_stream_spark.kv import KV_RESHARD_AT

    import json as _json
    import os as _os

    for b, gen in meta["shards"].items():
        with open(_os.path.join(workdir, KVStore._shard_filename(b, gen))) as f:
            assert len(_json.load(f)) <= 2 * KV_RESHARD_AT
    assert kv2.get(b"streams/very/common/prefix/004999") == (b"v", 5_000)
    items, _ = kv2.range(
        b"streams/very/common/prefix/00001",
        prefix_end(b"streams/very/common/prefix/00001"),
    )
    assert len(items) == 10
    # writes through the reopened handle keep splitting correctly
    for i in range(5_000, 5_100):
        kv2.put(f"streams/very/common/prefix/{i:06d}".encode(), b"w")
    assert kv2.get(b"streams/very/common/prefix/005050") is not None


def test_ordered_split_crash_window_leaves_store_unchanged(workdir):
    """The ordered layout rides the same commit protocol, so the same
    crash window must hold: new-generation bucket files on disk with the
    manifest still pointing at the pre-split generation leave every read
    serving the old layout; the next commit sweeps the orphans."""
    import json as _json
    import os as _os

    kv = KVStore(workdir, layout="ordered")
    with kv._txn() as st:
        for i in range(3_000):
            st.set_entry(f"k:{i:06d}".encode(), b"v")
    with open(_os.path.join(workdir, "kv-meta.json")) as f:
        meta_before = _json.load(f)
    assert len(meta_before["oranges"]) >= 2  # splits actually happened
    # simulate a crashed follow-up split: orphan generation files for an
    # existing bucket and a never-committed fresh one
    victims = [meta_before["oranges"][0][0], "o7ff"]
    for b in victims:
        with open(
            _os.path.join(workdir, f"kv-shard-{b}.000000099999.json"), "w"
        ) as f:
            f.write('{"bogus": {"value": "eA==", "version": 9}}')
    kv2 = KVStore(workdir)  # post-crash open (default arg; manifest wins)
    items, _ = kv2.range(b"k:", prefix_end(b"k:"))
    assert len(items) == 3_000  # old generation serves, no bogus key
    assert kv2.get(b"bogus") is None
    kv2.put(b"k:999999", b"new")  # first commit sweeps the orphans
    for b in victims:
        assert not _os.path.exists(
            _os.path.join(workdir, f"kv-shard-{b}.000000099999.json")
        )
    with open(_os.path.join(workdir, "kv-meta.json")) as f:
        meta_after = _json.load(f)
    assert meta_after["layout"] == "ordered"
    assert meta_after["n"] == 3_001


def test_ordered_readers_resolve_during_concurrent_splits(workdir):
    """The ordered layout's median splits ride the same manifest-swap
    commit, so lock-free point reads AND pruned span scans must stay
    consistent while a concurrent writer pushes a bucket through its
    split threshold — the reader always resolves (manifest-churn retry)
    and never sees a missing value or a torn boundary list."""
    import multiprocessing as mp

    from elastic_stream_spark.kv import KV_RESHARD_AT

    kv = KVStore(workdir, layout="ordered")
    base = 2 * KV_RESHARD_AT - 4  # one bucket, just under its threshold
    with kv._txn() as st:
        for i in range(base):
            st.set_entry(f"k:{i:07d}".encode(), b"v")

    def writer(root: str) -> None:
        w = KVStore(root)
        for i in range(300):  # crosses several median-split commits
            w.put(f"k:{base + i:07d}".encode(), b"g")

    def reader(root: str, q) -> None:
        r = KVStore(root)
        try:
            for i in range(400):
                k = f"k:{(i * 131) % base:07d}".encode()
                got = r.get(k)
                assert got is not None and got[0] == b"v", k
                if i % 20 == 0:  # pruned span scan mid-split
                    lo = f"k:{(i * 53) % (base - 10):07d}".encode()
                    items, _ = r.range(lo, KVStore.FROM_KEY, limit=5)
                    assert items and items[0][0] >= lo
            q.put("ok")
        except BaseException as e:  # surfaced to the asserting parent
            q.put(f"reader failed: {e!r}")

    ctx = mp.get_context("fork")
    q = ctx.Queue()
    pw = ctx.Process(target=writer, args=(workdir,))
    pr = ctx.Process(target=reader, args=(workdir, q))
    pr.start(); pw.start()
    pw.join(120); pr.join(120)
    assert pw.exitcode == 0 and pr.exitcode == 0
    assert q.get(timeout=10) == "ok"
    meta = kv._read_meta()
    assert len(meta["oranges"]) > 1  # the writer really split mid-read


def test_ordered_compaction_shrinks_emptied_ranges(workdir):
    """Delete-heavy schedules must not grow the boundary list forever:
    a span delete that empties interior buckets drops their entries at
    commit (successor inherits the span), an emptied TAIL re-opens the
    predecessor, and emptying everything leaves exactly one open-ended
    bucket that serves subsequent writes."""
    import json as _json
    import os as _os

    kv = KVStore(workdir, layout="ordered")
    with kv._txn() as st:
        for i in range(10_000):
            st.set_entry(f"k:{i:06d}".encode(), b"v")
    n0 = len(kv._read_meta()["oranges"])
    assert n0 >= 8
    # empty a wide interior band (≥ several whole buckets)
    assert kv.delete_range(b"k:002000", b"k:008000") == 6_000
    meta = kv._read_meta()
    assert len(meta["oranges"]) < n0  # interior entries compacted away
    uppers = [u for _, u in meta["oranges"]]
    dec = [KVStore._dec(u) for u in uppers[:-1]]
    assert dec == sorted(dec) and uppers[-1] is None
    # survivors intact, deleted band gone, scans correct across the merge
    items, _ = kv.range(b"k:", prefix_end(b"k:"))
    assert len(items) == 4_000
    assert kv.get(b"k:001999") is not None and kv.get(b"k:002000") is None
    # empty EVERYTHING: one open-ended bucket remains and still serves
    assert kv.delete_range(b"k:", prefix_end(b"k:")) == 4_000
    meta = kv._read_meta()
    assert len(meta["oranges"]) == 1 and meta["oranges"][0][1] is None
    assert meta["shards"] == {}
    kv.put(b"fresh", b"x")
    assert kv.get(b"fresh") == (b"x", kv._read_meta()["revision"])
    # no orphaned bucket files beyond the manifest's
    meta = kv._read_meta()
    live = {
        KVStore._shard_filename(b, g) for b, g in meta["shards"].items()
    }
    on_disk = {
        fn for fn in _os.listdir(workdir) if fn.startswith("kv-shard-")
    }
    assert on_disk == live


def test_ordered_boundary_list_respects_shard_cap(workdir, monkeypatch):
    """The ordered boundary list is capped at KV_MAX_SHARDS — the same
    manifest-size trade the hash layout makes at its round cap: past
    the cap, buckets grow beyond the occupancy target instead of the
    manifest growing with the keyspace.  With shrunken constants a
    bulk load far past the cap must stop at it, keep every key
    readable, and keep boundaries strictly ascending."""
    import json as _json
    import os as _os

    import elastic_stream_spark.kv as kvmod

    monkeypatch.setattr(kvmod, "KV_RESHARD_AT", 4)
    monkeypatch.setattr(kvmod, "KV_MAX_SHARDS", 8)
    kv = KVStore(workdir, layout="ordered")
    with kv._txn() as st:
        for i in range(1_000):
            st.set_entry(f"k:{i:05d}".encode(), b"v")
    with open(_os.path.join(workdir, "kv-meta.json")) as f:
        meta = _json.load(f)
    assert len(meta["oranges"]) <= 8
    uppers = [u for _, u in meta["oranges"]]
    dec = [KVStore._dec(u) for u in uppers[:-1]]
    assert dec == sorted(dec) and uppers[-1] is None
    items, _ = kv.range(b"k:", prefix_end(b"k:"))
    assert len(items) == 1_000
    # organic growth past the cap must also not split further
    for i in range(1_000, 1_050):
        kv.put(f"k:{i:05d}".encode(), b"w")
    with open(_os.path.join(workdir, "kv-meta.json")) as f:
        meta = _json.load(f)
    assert len(meta["oranges"]) <= 8
    assert kv.get(b"k:01049") is not None


def test_ordered_cross_process_cas_serializes_under_splits(workdir):
    """The linearizability claim holds on the ordered layout too, and
    WHILE the CAS target's bucket keeps splitting: 4 workers bump a
    shared counter via CAS-retry as each also inserts filler keys that
    push buckets through median splits; every increment lands exactly
    once and failed CAS txns stay revision-silent."""
    import json
    import multiprocessing as mp
    import os

    import elastic_stream_spark.kv as kvmod

    N_PROCS, N_INCR = 4, 25

    def worker(root: str, wid: int, n: int) -> None:
        # shrink the split threshold so the filler keys force splits
        kvmod.KV_RESHARD_AT = 8
        kv = KVStore(root)
        for i in range(n):
            kv.put(f"filler/{wid:02d}/{i:04d}".encode(), b"f")
            while True:
                got = kv.get(b"counter")
                cur, ver = (int(got[0]), got[1]) if got else (0, 0)
                if kv.cas(b"counter", ver, str(cur + 1).encode()):
                    break

    kv = KVStore(workdir, layout="ordered")
    kv.put(b"seed", b"s")  # COMMIT once so the ordered manifest exists
    ctx = mp.get_context("fork")
    procs = [
        ctx.Process(target=worker, args=(workdir, w, N_INCR))
        for w in range(N_PROCS)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
        assert p.exitcode == 0
    val, _ = kv.get(b"counter")
    assert int(val) == N_PROCS * N_INCR  # no lost update, no double-apply
    with open(os.path.join(workdir, "kv-meta.json")) as f:
        meta = json.load(f)
    assert meta["layout"] == "ordered"
    assert len(meta["oranges"]) > 1  # splits really happened mid-CAS
    assert meta["n"] == N_PROCS * N_INCR + 2  # fillers + counter + seed


def test_ordered_boundary_side_file_lifecycle(workdir, monkeypatch):
    """r14: past OR_INLINE_MAX boundaries the list moves to the
    kv-oranges.<gen>.json side file; a boundary-preserving put must
    REUSE the standing generation (zero boundary serialization — the
    whole point), a boundary-changing commit must atomically swap in a
    new generation and GC the old, and shrinking back below the
    threshold must re-inline and drop the file."""
    import os as _os

    import elastic_stream_spark.kv as kvmod

    monkeypatch.setattr(kvmod, "KV_RESHARD_AT", 4)
    monkeypatch.setattr(kvmod, "OR_INLINE_MAX", 6)
    kv = KVStore(workdir, layout="ordered")
    for i in range(200):
        kv.put(f"k{i:04d}".encode(), f"v{i}".encode())
    meta = kv._read_meta()
    assert "oranges" not in meta and "oranges_gen" in meta
    files = [f for f in _os.listdir(workdir) if f.startswith("kv-oranges.")]
    assert files == [KVStore._oranges_file(meta["oranges_gen"])]
    boundaries = kv._oranges(meta)
    assert len(boundaries) > 6
    # boundary-preserving puts: same generation across many commits
    g0 = meta["oranges_gen"]
    for i in range(10):
        kv.put(f"k{i:04d}".encode(), b"upd")
    assert kv._read_meta()["oranges_gen"] == g0
    # a split (boundary change) swaps the generation and GCs the old.
    # Keep inserting dense batches until one triggers (bounded), then
    # assert UNCONDITIONALLY — the old `if gen changed` guard could
    # silently skip the GC property when the single batch happened not
    # to split (r14 ADVICE)
    for batch in range(10):
        with kv._txn() as st:
            for i in range(1000 + 20 * batch, 1020 + 20 * batch):
                st.set_entry(f"k{i:04d}".encode(), b"grow")
        if kv._read_meta().get("oranges_gen") != g0:
            break
    m2 = kv._read_meta()
    assert m2.get("oranges_gen") != g0, (
        "no boundary split after 200 dense inserts under patched "
        "KV_RESHARD_AT=4 — the GC property went untested"
    )
    assert not _os.path.exists(
        _os.path.join(workdir, KVStore._oranges_file(g0))
    )
    # reads resolve through the side file, cold-handle and warm alike
    kv2 = KVStore(workdir)
    assert len(kv2.range(b"k00", prefix_end(b"k00"))[0]) == 100
    assert kv2.get(b"k0000") == (b"upd", kv2.get(b"k0000")[1])
    # delete everything → compaction shrinks below the threshold →
    # re-inlined, side file gone
    kv.delete_range(b"k", prefix_end(b"k"))
    m3 = kv._read_meta()
    assert "oranges" in m3 and "oranges_gen" not in m3
    assert not [
        f for f in _os.listdir(workdir) if f.startswith("kv-oranges.")
    ]
    kv.put(b"fresh", b"x")
    assert kv.get(b"fresh")[0] == b"x"


def test_ordered_oranges_orphan_swept_after_crash_window(workdir, monkeypatch):
    """A crash between writing a new boundary generation and the
    manifest rename leaves an unreferenced kv-oranges file; the next
    committer's orphan sweep must reclaim it while keeping the live
    generation."""
    import os as _os

    import elastic_stream_spark.kv as kvmod

    monkeypatch.setattr(kvmod, "KV_RESHARD_AT", 4)
    monkeypatch.setattr(kvmod, "OR_INLINE_MAX", 6)
    kv = KVStore(workdir, layout="ordered")
    for i in range(100):
        kv.put(f"k{i:04d}".encode(), b"v")
    live_gen = kv._read_meta()["oranges_gen"]
    bogus = _os.path.join(workdir, KVStore._oranges_file(99_999))
    with open(bogus, "w") as f:
        f.write('{"oranges": [["o000", null]]}')
    kv2 = KVStore(workdir)  # post-crash open
    assert len(kv2.range(b"k", prefix_end(b"k"))[0]) == 100  # manifest wins
    kv2.put(b"k9999", b"new")  # first commit sweeps
    assert not _os.path.exists(bogus)
    m = kv2._read_meta()
    assert _os.path.exists(
        _os.path.join(workdir, KVStore._oranges_file(m["oranges_gen"]))
    )


def test_ordered_missing_side_file_is_diagnosed_not_retried(
    workdir, monkeypatch
):
    """r14 ADVICE: a PERMANENTLY missing kv-oranges.<gen>.json (manual
    deletion, a partial backup that grabbed kv-meta.json + kv-shard-*
    only) must surface as a corruption error NAMING the file — not 64
    silent retries ending in the misleading 'manifest churn exceeded
    retries' (which describes a live-concurrency condition, not a dead
    store).  Gens are monotonic, so same-gen + still-absent on the
    retry proves no concurrent commit can explain the absence."""
    import os as _os

    import pytest as _pytest

    import elastic_stream_spark.kv as kvmod

    monkeypatch.setattr(kvmod, "KV_RESHARD_AT", 4)
    monkeypatch.setattr(kvmod, "OR_INLINE_MAX", 6)
    kv = KVStore(workdir, layout="ordered")
    for i in range(200):
        kv.put(f"k{i:04d}".encode(), b"v")
    meta = kv._read_meta()
    assert "oranges_gen" in meta  # boundaries really live in the side file
    fname = KVStore._oranges_file(meta["oranges_gen"])
    _os.unlink(_os.path.join(workdir, fname))
    # cold handle (no warm _oranges_cache); both read paths diagnose
    kv2 = KVStore(workdir)
    with _pytest.raises(RuntimeError, match=fname):
        kv2.get(b"k0000")
    kv3 = KVStore(workdir)
    with _pytest.raises(RuntimeError, match=fname):
        kv3.range(b"k", b"l")


def test_ordered_cap_not_overshot_by_multi_oversize_txn(workdir, monkeypatch):
    """r13 advice: the cap was checked once per split PASS, so a txn
    with several organically-oversize dirty buckets one below the cap
    split them all and pushed len(oranges) past KV_MAX_SHARDS
    (reproduced: cap 8 → 9).  The check is per SPLIT now: the invariant
    len(oranges) ≤ KV_MAX_SHARDS must hold after ANY txn."""
    import elastic_stream_spark.kv as kvmod

    # grow several buckets under a lenient threshold first
    monkeypatch.setattr(kvmod, "KV_RESHARD_AT", 16)
    kv = KVStore(workdir, layout="ordered")
    with kv._txn() as st:
        for i in range(120):
            st.set_entry(f"k{i:04d}".encode(), b"v")
    n_b = len(kv._oranges(kv._read_meta()))
    assert n_b >= 3
    # now tighten: every standing bucket is oversize, cap one above
    monkeypatch.setattr(kvmod, "KV_RESHARD_AT", 4)
    monkeypatch.setattr(kvmod, "KV_MAX_SHARDS", n_b + 1)
    with kv._txn() as st:  # dirty EVERY bucket in one txn
        for i in range(120):
            st.set_entry(f"k{i:04d}".encode(), b"w")
    oranges = kv._oranges(kv._read_meta())
    assert len(oranges) <= n_b + 1, (
        f"cap overshot: {len(oranges)} > {n_b + 1}"
    )
    # data intact regardless
    items, _ = kv.range(b"k", prefix_end(b"k"))
    assert len(items) == 120 and all(v == b"w" for _, v, _ in items)


def test_migrate_layout_hash_to_ordered(workdir, monkeypatch):
    """r13 VERDICT item 4: a populated hash store migrates offline to
    the ordered layout with byte-identical range()/get() results and
    versions, pruned span scans after, and idempotent re-invocation."""
    import elastic_stream_spark.kv as kvmod

    kv = KVStore(workdir)  # hash
    vers = {}
    for i in range(3_000):
        vers[i] = kv.put(f"m{i:05d}".encode(), f"w{i}".encode())
    kv.delete_range(b"m00100", b"m00200")  # holes survive migration too
    before = kv.range(b"", KVStore.FROM_KEY)
    rev_before = kv._read_meta()["revision"]

    kv.migrate_layout("ordered")

    m = kv._read_meta()
    assert m["layout"] == "ordered" and m["revision"] == rev_before
    assert kv.range(b"", KVStore.FROM_KEY) == before  # bytes + versions
    assert kv.get(b"m02999") == (b"w2999", vers[2999])
    assert kv.get(b"m00150") is None
    # span scans now prune to the overlapping buckets
    reads: list[str] = []
    orig = KVStore._read_bucket_file

    def counting(self, meta, b):
        reads.append(b)
        return orig(self, meta, b)

    monkeypatch.setattr(KVStore, "_read_bucket_file", counting)
    items, _ = kv.range(b"m0250", prefix_end(b"m0250"))
    assert len(items) == 10
    assert len(reads) <= 2, f"span scan read {len(reads)} buckets post-migration"
    monkeypatch.undo()
    # idempotent; ordered→hash unsupported by design
    kv.migrate_layout("ordered")
    assert kv.range(b"", KVStore.FROM_KEY) == before
    try:
        kv.migrate_layout("hash")
        raise AssertionError("ordered→hash must be rejected")
    except ValueError:
        pass
    # fresh handle reads the migrated store; writes keep splitting
    kv2 = KVStore(workdir)
    kv2.put(b"m99999", b"tail")
    assert kv2.get(b"m99999")[0] == b"tail"


def test_migrate_layout_crash_window_leaves_hash_store_live(workdir, monkeypatch):
    """The migration's commit point is the single manifest rename: a
    crash AFTER the ordered bucket + boundary files are written but
    BEFORE the rename must leave the hash layout fully serving (reads
    and writes), with the half-written ordered files reclaimed by the
    next committer's orphan sweep."""
    import os as _os

    kv = KVStore(workdir)
    for i in range(2_000):
        kv.put(f"c{i:05d}".encode(), f"v{i}".encode())
    before = kv.range(b"", KVStore.FROM_KEY)

    orig = KVStore._write_file

    def dying(self, name, payload):
        if name == "kv-meta.json":
            raise OSError("simulated crash before the manifest rename")
        orig(self, name, payload)

    monkeypatch.setattr(KVStore, "_write_file", dying)
    try:
        kv.migrate_layout("ordered")
        raise AssertionError("migration should have crashed")
    except OSError:
        pass
    monkeypatch.undo()
    # debris exists, but the store still serves the hash layout
    debris = [
        f
        for f in _os.listdir(workdir)
        if f.startswith("kv-shard-o") or f.startswith("kv-oranges.")
    ]
    assert debris  # the crash really left half-written ordered files
    kv2 = KVStore(workdir)  # post-crash open
    assert kv2._read_meta().get("layout", "hash") == "hash"
    assert kv2.range(b"", KVStore.FROM_KEY) == before
    kv2.put(b"c99999", b"after")  # first commit sweeps the debris
    for f in debris:
        assert not _os.path.exists(_os.path.join(workdir, f)), f
    # and a RETRIED migration completes cleanly on the same store
    kv2.migrate_layout("ordered")
    assert kv2._read_meta()["layout"] == "ordered"
    assert kv2.get(b"c99999")[0] == b"after"
    assert len(kv2.range(b"c", prefix_end(b"c"))[0]) == 2_001


def test_migrate_layout_legacy_and_empty_stores(workdir):
    """A pre-shard monolithic kv.json migrates straight to ordered
    (revision and versions preserved); an empty hash store just flips
    its layout and serves subsequent writes."""
    import json as _json
    import os as _os

    legacy_root = _os.path.join(workdir, "legacy")
    _os.makedirs(legacy_root)
    legacy = {
        "revision": 7,
        "data": {
            KVStore._enc(f"L{i}".encode()): {
                "value": KVStore._enc(b"old"),
                "version": i + 1,
            }
            for i in range(5)
        },
    }
    with open(_os.path.join(legacy_root, "kv.json"), "w") as f:
        _json.dump(legacy, f)
    kv = KVStore(legacy_root)
    kv.migrate_layout("ordered")
    m = kv._read_meta()
    assert m["layout"] == "ordered" and m["revision"] == 7
    assert not _os.path.exists(_os.path.join(legacy_root, "kv.json"))
    assert kv.get(b"L3") == (b"old", 4)
    assert len(kv.range(b"L", prefix_end(b"L"))[0]) == 5

    empty_root = _os.path.join(workdir, "empty")
    e = KVStore(empty_root)
    e.put(b"x", b"1")
    e.delete_range(b"x")
    e.migrate_layout("ordered")
    assert e._read_meta()["layout"] == "ordered"
    rev = e.put(b"y", b"2")
    assert e.get(b"y") == (b"2", rev)


def test_to_df_on_ordered_store_across_splits(spark, workdir):
    """The ``_kv`` DataFrame view reads the full snapshot regardless of
    layout: an ordered store that has split several times must expose
    every (key, value, version) row exactly once."""
    kv = KVStore(workdir, layout="ordered")
    with kv._txn() as st:
        for i in range(3_000):
            st.set_entry(f"k:{i:05d}".encode(), str(i).encode())
    assert len(kv._read_meta()["oranges"]) > 1
    df = kv.to_df(spark)
    assert df.count() == 3_000
    got = {bytes(r.key): bytes(r.value) for r in df.collect()}
    assert got[b"k:02999"] == b"2999" and len(got) == 3_000
