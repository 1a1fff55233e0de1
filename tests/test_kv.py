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
