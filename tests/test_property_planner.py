"""Property test: the migration planner's op list, interpreted over the
current InfraMap, must reproduce the target map — for random spec pairs.

This is the correctness statement behind `moose plan`/`migrate`
(plan.rs:714-760, diff_strategy.rs): a plan is not a diff printout, it is a
program whose execution transforms current infrastructure into target
infrastructure.  The interpreter here applies each op to a dict model the
same way execute.rs applies DDL to ClickHouse.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from moosestack_spark.catalog.planner import (
    ColumnSpec,
    InfraMap,
    Op,
    TableSpec,
    plan_changes,
)

col_names = st.sampled_from(["a", "b", "c", "d", "e"])
col_types = st.sampled_from(["bigint", "string", "double"])
columns = st.dictionaries(col_names, col_types, min_size=1, max_size=4)

table_names = st.sampled_from(["t1", "t2", "t3"])


def mk_table(name, cols, order_by, settings):
    return TableSpec(
        name=name,
        columns=[ColumnSpec(n, t, False) for n, t in sorted(cols.items())],
        order_by=tuple(order_by),
        partition_by=None,
        engine="MergeTree",
        settings=dict(settings),
    )


tables = st.dictionaries(
    table_names,
    st.tuples(
        columns,
        st.sampled_from([(), ("a",)]),
        st.sampled_from([{}, {"index_granularity": "8192"}]),
    ),
    max_size=3,
)


def mk_map(spec):
    return InfraMap(
        tables={
            name: mk_table(name, cols, ob, settings)
            for name, (cols, ob, settings) in spec.items()
        },
        views={},
        materialized_views={},
    )


def apply_ops(current: InfraMap, target: InfraMap, ops: list[Op]) -> InfraMap:
    """Interpreter: execute the plan against the current state."""
    state = {name: tbl for name, tbl in current.tables.items()}
    for op in ops:
        if op.kind in ("create_table", "recreate_table"):
            state[op.target] = target.tables[op.target]
        elif op.kind == "drop_table":
            state.pop(op.target, None)
        elif op.kind == "add_column":
            tgt_col = next(
                c for c in target.tables[op.target].columns if c.name == op.detail
            )
            cur = state[op.target]
            state[op.target] = TableSpec(
                cur.name, cur.columns + [tgt_col], cur.order_by,
                cur.partition_by, cur.engine, cur.settings,
            )
        elif op.kind == "drop_column":
            cur = state[op.target]
            state[op.target] = TableSpec(
                cur.name,
                [c for c in cur.columns if c.name != op.detail],
                cur.order_by, cur.partition_by, cur.engine, cur.settings,
            )
        elif op.kind == "modify_column":
            col_name = op.detail.split(":", 1)[0]
            tgt_col = next(
                c for c in target.tables[op.target].columns if c.name == col_name
            )
            cur = state[op.target]
            state[op.target] = TableSpec(
                cur.name,
                [tgt_col if c.name == col_name else c for c in cur.columns],
                cur.order_by, cur.partition_by, cur.engine, cur.settings,
            )
        elif op.kind == "modify_settings":
            cur = state[op.target]
            state[op.target] = TableSpec(
                cur.name, cur.columns, cur.order_by, cur.partition_by,
                cur.engine, dict(target.tables[op.target].settings),
            )
    return InfraMap(tables=state, views={}, materialized_views={})


def canon(m: InfraMap):
    return {
        name: (
            sorted((c.name, c.type, c.nullable) for c in t.columns),
            tuple(t.order_by),
            t.partition_by,
            t.engine,
            sorted(t.settings.items()),
        )
        for name, t in m.tables.items()
    }


@given(cur=tables, tgt=tables)
@settings(max_examples=200, deadline=None)
def test_plan_applied_to_current_yields_target(cur, tgt):
    current, target = mk_map(cur), mk_map(tgt)
    ops = plan_changes(current, target)
    result = apply_ops(current, target, ops)
    assert canon(result) == canon(target)


@given(spec=tables)
@settings(max_examples=50, deadline=None)
def test_plan_is_empty_when_maps_equal(spec):
    m1, m2 = mk_map(spec), mk_map(spec)
    assert plan_changes(m1, m2) == []
