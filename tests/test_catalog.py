"""Cross-table SQL over MVCC-consistent snapshots (IceCatalog)."""

from __future__ import annotations

import pytest

from icedb_spark import IceCatalog, IceTable, PartitionField, PartitionSpec
from icedb_spark.log import get_log_file_info


def _mk(spark, path):
    return IceTable(
        spark,
        str(path),
        partition_spec=PartitionSpec(fields=[PartitionField("b", "bucket")]),
        sort_order=["k"],
    )


@pytest.fixture()
def cat(spark, tmp_path):
    users = _mk(spark, tmp_path / "users")
    orders = _mk(spark, tmp_path / "orders")
    users.insert([{"bucket": "b", "k": i, "name": f"u{i}"} for i in range(5)])
    orders.insert(
        [{"bucket": "b", "k": i % 5, "amount": float(i)} for i in range(20)]
    )
    return IceCatalog(spark).add("users", users).add("orders", orders)


def test_cross_table_join(cat):
    out = cat.sql(
        "select u.name, sum(o.amount) as total from users u "
        "join orders o on u.k = o.k group by u.name order by u.name"
    ).collect()
    assert len(out) == 5
    assert out[0]["name"] == "u0"
    # k=0 matches orders 0,5,10,15 -> 30.0
    assert out[0]["total"] == 30.0


def test_consistent_time_travel_across_tables(cat, spark):
    users, orders = cat.table("users"), cat.table("orders")
    t0 = get_log_file_info(orders.snapshot().log_files[-1])[0]
    # later commits to BOTH tables
    users.insert([{"bucket": "b", "k": 99, "name": "u99"}])
    orders.insert([{"bucket": "b", "k": 99, "amount": 1000.0}])
    now_total = cat.sql(
        "select count(*) as c from users u join orders o on u.k = o.k"
    ).collect()[0]["c"]
    past_total = cat.sql(
        "select count(*) as c from users u join orders o on u.k = o.k",
        at_ms=t0,
    ).collect()[0]["c"]
    assert now_total == 21  # 20 original matches + the new pair
    assert past_total == 20  # neither table's later commit visible at t0


def test_add_validation(cat, spark, tmp_path):
    with pytest.raises(ValueError):
        cat.add("not a name", _mk(spark, tmp_path / "x"))
    assert cat.names() == ["orders", "users"]


def test_remove_drops_stale_view(cat, spark):
    cat.sql("select count(*) as c from users").collect()
    cat.remove("users")
    import pyspark.errors

    with pytest.raises(pyspark.errors.AnalysisException):
        spark.sql("select count(*) from users").collect()


def test_sql_only_folds_referenced_tables(cat, spark):
    """A query naming one table must not fold (or re-register) the others."""
    users = cat.table("users")
    gets = {"n": 0}
    orig = users.log_storage

    class Counting:
        def __getattr__(self, name):
            return getattr(orig, name)

        def get(self, key):
            gets["n"] += 1
            return orig.get(key)

    users.log_storage = Counting()
    out = cat.sql("select count(*) as c from orders").collect()
    assert out[0]["c"] == 20
    assert gets["n"] == 0  # users' log untouched by an orders-only query


def test_default_instant_is_shared_across_tables(cat, monkeypatch):
    """at_ms=None must pin ONE wall-clock instant for every registered
    table — otherwise a commit landing between two registrations yields a
    join mixing snapshots."""
    from icedb_spark.table import IceTable

    seen = []
    orig_read = IceTable.read

    def recording_read(self, *args, **kwargs):
        seen.append(kwargs.get("at_ms"))
        return orig_read(self, *args, **kwargs)

    monkeypatch.setattr(IceTable, "read", recording_read)
    cat.sql("select count(*) as c from users u join orders o on u.k = o.k").collect()
    assert len(seen) == 2
    assert all(isinstance(a, int) for a in seen)
    assert seen[0] == seen[1]


def test_add_replacing_name_drops_prior_view(cat, spark, tmp_path):
    """Re-adding a name must not leave the old table's frozen view
    answering queries."""
    cat.sql("select count(*) as c from users").collect()
    fresh = _mk(spark, tmp_path / "users2")
    fresh.insert([{"bucket": "b", "k": 1, "name": "only"}])
    cat.add("users", fresh)
    out = cat.sql("select count(*) as c from users").collect()
    assert out[0]["c"] == 1


def test_add_path_mounts_from_persisted_metadata(spark, tmp_path):
    from icedb_spark import IceCatalog, IceTable, PartitionField, PartitionSpec

    t = IceTable(
        spark, str(tmp_path / "mnt"),
        partition_spec=PartitionSpec(fields=[PartitionField("k", "kind")]),
        sort_order=["id"],
    )
    t.insert(rows=[{"id": 1, "kind": "a"}, {"id": 2, "kind": "b"}])
    cat = IceCatalog(spark).add_path("mounted", str(tmp_path / "mnt"))
    got = cat.sql("select count(*) as c from mounted").collect()[0]["c"]
    assert got == 2


def test_catalog_routes_dml_to_the_named_table(spark, tmp_path):
    from icedb_spark import IceCatalog, IceTable, PartitionField, PartitionSpec

    a = IceTable(
        spark, str(tmp_path / "dml-a"),
        partition_spec=PartitionSpec(fields=[PartitionField("k", "kind")]),
        sort_order=["id"],
    )
    b = IceTable(
        spark, str(tmp_path / "dml-b"),
        partition_spec=PartitionSpec(fields=[PartitionField("k", "kind")]),
        sort_order=["id"],
    )
    a.insert(rows=[{"id": 1, "kind": "x"}, {"id": 2, "kind": "x"}])
    b.insert(rows=[{"id": 9, "kind": "y"}])
    cat = IceCatalog(spark).add("ta", a).add("tb", b)

    out = cat.sql("DELETE FROM tb WHERE id = 9").collect()[0]
    assert out["operation"] == "delete" and out["rows_deleted"] == 1
    assert a.read().count() == 2 and b.read().count() == 0  # only tb touched
    assert cat.sql("select count(*) as c from ta").collect()[0]["c"] == 2

    out = cat.sql("OPTIMIZE ta").collect()[0]
    assert out["operation"] == "optimize"

    import pytest as _pt

    with _pt.raises(ValueError, match="time-traveled"):
        cat.sql("DELETE FROM ta WHERE id = 1", at_ms=123)
    assert a.read().count() == 2  # refused before any mutation

def test_time_travel_dml_error_only_when_a_table_matches(cat, spark):
    """ADVICE r3: a DML-shaped query over an UNREGISTERED name must fall
    through to plain SQL even with at_ms set; the contradiction error is
    reserved for statements that would actually route to a table."""
    # routes to a registered table -> the at_ms contradiction raises
    with pytest.raises(ValueError, match="time-traveled"):
        cat.sql("DELETE FROM orders WHERE k = 1", at_ms=1)
    # matches no registered table -> falls through to Spark SQL, which
    # surfaces ITS error (table not found), not the at_ms contradiction
    with pytest.raises(Exception) as e:
        cat.sql("DELETE FROM not_registered WHERE k = 1", at_ms=1)
    assert "time-traveled" not in str(e.value)
    # and nothing was mutated by the first refusal
    assert cat.sql("select count(*) as c from orders").collect()[0]["c"] == 20


def test_discover_mounts_warehouse_tree(spark, tmp_path):
    """discover() attaches every child directory holding a persisted
    _meta/spec.json under its directory name; non-table children are
    skipped."""
    wh = tmp_path / "wh"
    for nm in ("users", "orders"):
        t = _mk(spark, wh / nm)
        t.insert([{"bucket": "b", "k": 1, "name": nm}])
    (wh / "not_a_table").mkdir(parents=True)
    (wh / "not_a_table" / "junk.txt").write_text("x")
    cat = IceCatalog(spark).discover(str(wh))
    assert cat.names() == ["orders", "users"]
    out = cat.sql(
        "select name from users union all select name from orders"
    ).collect()
    assert sorted(r["name"] for r in out) == ["orders", "users"]


def test_discover_skips_stray_and_corrupt_specs(spark, tmp_path):
    """A file merely ENDING in spec.json (backup-spec.json), a corrupt
    spec, or a non-identifier directory name must be skipped — not abort
    the whole warehouse mount."""
    wh = tmp_path / "wh"
    t = _mk(spark, wh / "good")
    t.insert([{"bucket": "b", "k": 1, "name": "g"}])
    (wh / "stray" / "_meta").mkdir(parents=True)
    (wh / "stray" / "_meta" / "backup-spec.json").write_text("{}")
    (wh / "corrupt" / "_meta").mkdir(parents=True)
    (wh / "corrupt" / "_meta" / "spec.json").write_text("{not json")
    bad = _mk(spark, wh / "not-an-identifier")
    bad.insert([{"bucket": "b", "k": 1, "name": "x"}])
    cat = IceCatalog(spark).discover(str(wh))
    assert cat.names() == ["good"]


def test_discover_then_remove(spark, tmp_path):
    """remove() survives next to discover() (regression: discover once
    clobbered the remove method)."""
    wh = tmp_path / "wh"
    t = _mk(spark, wh / "solo")
    t.insert([{"bucket": "b", "k": 1, "name": "s"}])
    cat = IceCatalog(spark).discover(str(wh))
    assert cat.names() == ["solo"]
    cat.remove("solo")
    assert cat.names() == []


def test_catalog_sql_projects_views_to_query_columns(spark, tmp_path):
    """catalog.sql narrows each registered table's view to the columns
    the query text can reference (fallback-path projection), with exact
    results and full width preserved for starred queries."""
    from icedb_spark import IceCatalog, IceTable, PartitionField, PartitionSpec

    def mk(name):
        return IceTable(
            spark,
            str(tmp_path / name),
            partition_spec=PartitionSpec(
                fields=[PartitionField("b", "bucket")]
            ),
            sort_order=["k"],
        )

    facts, dims = mk("facts"), mk("dims")
    cat = IceCatalog(spark).add("facts", facts).add("dims", dims)
    facts.insert([{"bucket": "b", "k": i, "v": float(i)} for i in range(6)])
    dims.insert([{"bucket": "b", "k": i, "name": f"n{i}"} for i in range(3)])
    row = cat.sql(
        "select sum(f.v) as s, count(*) as n "
        "from facts f join dims d on f.k = d.k"
    ).collect()[0]
    assert (row["s"], row["n"]) == (0.0 + 1.0 + 2.0, 3)
    # the registered views are the projected ones (identifier superset:
    # 'name' from dims also matches nothing in facts' schema... it
    # would if facts had a column so named — conservative over-keep)
    assert set(spark.table("facts").columns) == {"k", "v"}
    assert set(spark.table("dims").columns) == {"k"}
    # a starred query re-registers full width
    assert cat.sql("select * from facts").columns == spark.table(
        "facts"
    ).columns
    assert set(spark.table("facts").columns) == {"bucket", "k", "v"}
