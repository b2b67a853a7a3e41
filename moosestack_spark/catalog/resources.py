"""Resource registry + InfraMap bridge — the `moose` lifecycle glue.

Port target: py-moose-lib/moose_lib/dmv2/_registry.py:1-24 (constructors
self-register) and internal.py:969-1192 (to_infra_map): user code declares
OlapTables; the CLI (moosestack_spark.__main__) reflects the registry into
the planner's InfraMap IR and diffs it against saved state + warehouse
reality.  Registration is last-wins by name so re-imports and test suites
stay idempotent.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from moosestack_spark.catalog.planner import ColumnSpec, InfraMap, TableSpec

if TYPE_CHECKING:  # pragma: no cover
    from moosestack_spark.catalog.table import OlapTable

_TABLES: dict[str, "OlapTable"] = {}


def register_table(table: "OlapTable") -> None:
    _TABLES[table.name] = table


def unregister_table(table: "OlapTable") -> None:
    """Dropped tables must leave the registry, or infra_map_from_registry()
    plans them as real tables forever (they'd be re-created on the next
    migrate).  Identity-checked: a newer same-named registration wins and
    is not removed by the older instance's drop."""
    if _TABLES.get(table.name) is table:
        del _TABLES[table.name]


def registered_tables() -> dict[str, "OlapTable"]:
    return dict(_TABLES)


def clear_resources() -> None:
    _TABLES.clear()


def table_to_spec(table: "OlapTable") -> TableSpec:
    """OlapTable -> the planner's TableSpec IR (the serialization
    subprocess's table JSON in the reference, internal.py:969+)."""
    cols = []
    for c in table.columns:
        enum_name = c.annotations.get("enum_name")
        enum_values = c.annotations.get("enum_values")
        members = (
            tuple((str(v), v) for v in enum_values) if enum_values else None
        )
        cols.append(
            ColumnSpec(
                name=c.name,
                type=c.data_type.simpleString(),
                nullable=not c.required,
                enum_name=enum_name,
                enum_members=members,
            )
        )
    eng = table.config.engine
    return TableSpec(
        name=table.name,
        columns=cols,
        order_by=tuple(table.config.order_by_fields or ()),
        partition_by=table.config.partition_by,
        engine=(eng.name if eng is not None else "MergeTree"),
        settings=dict(table.config.settings or {}),
        version=table.config.version,
        database=table.config.database,
    )


def infra_map_from_registry() -> InfraMap:
    """The registry's target InfraMap (what `moose plan` diffs toward)."""
    return InfraMap(
        tables={name: table_to_spec(t) for name, t in _TABLES.items()}
    )
