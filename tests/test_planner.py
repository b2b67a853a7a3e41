"""Migration planner tests (reference: diff_strategy.rs + ddl_ordering.rs
inline tests, framework-cli-e2e migration.test.ts shapes)."""

from __future__ import annotations

from moosestack_spark.catalog.planner import (
    ColumnSpec,
    InfraMap,
    MaterializedViewSpec,
    Op,
    TableSpec,
    ViewSpec,
    diff_tables,
    load_state,
    plan_changes,
    save_state,
)


def _t(name, cols, **kw):
    return TableSpec(name=name, columns=[ColumnSpec(*c) for c in cols], **kw)


def test_create_and_drop():
    cur = InfraMap()
    tgt = InfraMap(tables={"a": _t("a", [("id", "bigint")])})
    assert [o.kind for o in plan_changes(cur, tgt)] == ["create_table"]
    assert [o.kind for o in plan_changes(tgt, cur)] == ["drop_table"]


def test_alter_add_drop_modify():
    cur = InfraMap(tables={"a": _t("a", [("id", "bigint"), ("x", "string"), ("gone", "int")])})
    tgt = InfraMap(
        tables={"a": _t("a", [("id", "bigint"), ("x", "double"), ("new_col", "string")])}
    )
    kinds = {(o.kind, o.detail.split(":")[0]) for o in plan_changes(cur, tgt)}
    assert kinds == {
        ("add_column", "new_col"),
        ("modify_column", "x"),
        ("drop_column", "gone"),
    }


def test_order_by_change_forces_recreate():
    cur = InfraMap(tables={"a": _t("a", [("id", "bigint")], order_by=("id",))})
    tgt = InfraMap(tables={"a": _t("a", [("id", "bigint")])})
    assert [o.kind for o in plan_changes(cur, tgt)] == ["recreate_table"]


def test_engine_change_forces_recreate():
    cur = InfraMap(tables={"a": _t("a", [("id", "bigint")], engine="MergeTree")})
    tgt = InfraMap(tables={"a": _t("a", [("id", "bigint")], engine="ReplacingMergeTree")})
    assert [o.kind for o in plan_changes(cur, tgt)] == ["recreate_table"]


def test_settings_only_alter():
    cur = InfraMap(tables={"a": _t("a", [("id", "bigint")])})
    tgt = InfraMap(tables={"a": _t("a", [("id", "bigint")], settings={"ttl": "30d"})})
    assert [o.kind for o in plan_changes(cur, tgt)] == ["modify_settings"]


def test_view_update_on_sql_change():
    cur = InfraMap(views={"v": ViewSpec("v", "SELECT 1")})
    tgt = InfraMap(views={"v": ViewSpec("v", "SELECT 2")})
    assert [o.kind for o in plan_changes(cur, tgt)] == ["update_view"]
    same = InfraMap(views={"v": ViewSpec("v", "  SELECT 1  ")})  # normalized
    assert plan_changes(cur, same) == []


def test_mv_depends_on_tables_ordering():
    cur = InfraMap()
    tgt = InfraMap(
        tables={
            "src": _t("src", [("id", "bigint")]),
            "agg": _t("agg", [("id", "bigint"), ("n", "bigint")]),
        },
        materialized_views={
            "mv": MaterializedViewSpec("mv", "SELECT ...", ("src",), "agg")
        },
    )
    ops = plan_changes(cur, tgt)
    kinds = [o.kind for o in ops]
    # tables created before the MV; populate after create_mv
    assert kinds.index("create_mv") > kinds.index("create_table")
    assert kinds.index("populate_mv") > kinds.index("create_mv")


def test_drop_mv_before_dropping_source_table():
    cur = InfraMap(
        tables={"src": _t("src", [("id", "bigint")])},
        materialized_views={"mv": MaterializedViewSpec("mv", "S", ("src",), "tgt")},
    )
    tgt = InfraMap()
    kinds = [o.kind for o in plan_changes(cur, tgt)]
    assert kinds.index("drop_mv") < kinds.index("drop_table")


def test_state_roundtrip(tmp_path):
    m = InfraMap(
        tables={"a": _t("a", [("id", "bigint"), ("x", "string", True)], order_by=("id",))},
        views={"v": ViewSpec("v", "SELECT 1", ("a",))},
        materialized_views={"mv": MaterializedViewSpec("mv", "SELECT id FROM a", ("a",), "b")},
    )
    save_state(str(tmp_path), m)
    back = load_state(str(tmp_path))
    assert back.tables["a"].order_by == ("id",)
    assert back.tables["a"].columns[1].nullable is True
    assert back.materialized_views["mv"].source_tables == ("a",)
    assert plan_changes(back, m) == []  # no drift
    assert load_state(str(tmp_path / "missing")).tables == {}
