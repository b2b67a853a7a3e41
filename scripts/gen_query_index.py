#!/usr/bin/env python
"""Regenerate the auto-generated complete gate-query index in SURVEY.md.

Usage: python scripts/gen_query_index.py   (rewrites the section in place)

The index lists EVERY registered gate query with its check type (oracle vs
rows-only) and implementing module, so the operator inventory can be
checked line-by-line against the registry mechanically.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN = "<!-- BEGIN AUTO QUERY INDEX -->"
END = "<!-- END AUTO QUERY INDEX -->"


def _schemas(registry) -> dict[str, list[tuple[str, str]]]:
    """(name, [(col, dtype)]) for every gate by building each query's plan
    at the smallest SF.  Also the driver-canon CI gate: an ORACLED query
    whose output schema contains an Array/Map/Struct column makes the
    driver's pandas canonicalizer ERR — fail loudly here."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from moosestack_spark.session import get_spark

    spark = get_spark("gen-query-index")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    out: dict[str, list[tuple[str, str]]] = {}
    bad: list[str] = []
    for name, fn in registry.QUERIES.items():
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as exc:  # pragma: no cover - index generation aid
            print(f"WARN: {name} failed to build: {exc!r}"[:200], file=sys.stderr)
            out[name] = [("?", "error")]
            continue
        out[name] = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        if name in registry.ORACLES and any(
            isinstance(f.dataType, (ArrayType, MapType, StructType))
            for f in schema.fields
        ):
            bad.append(name)
    if bad:
        raise SystemExit(
            f"driver-canon contract violation: oracled gates with complex-typed "
            f"output columns: {bad} (serialize with registry.canon_arrays)"
        )
    return out


def build_index() -> str:
    from moosestack_spark import registry

    registry.load_all()
    schemas = _schemas(registry)
    lines = [
        BEGIN,
        "",
        "## Appendix: complete gate-query index (auto-generated)",
        "",
        "Regenerate with `python scripts/gen_query_index.py`.  One row per",
        "registered query; `oracle` = hard value-hash gate vs DuckDB,",
        "`rows` = rows-only driver check (approximate/sketch/sequential ops,",
        "each determinism/recall-pinned in pytest).",
        "",
        f"Total: **{len(registry.QUERIES)}** queries, "
        f"**{len(registry.ORACLES)}** oracled, "
        f"**{len(registry.QUERIES) - len(registry.ORACLES)}** rows-only.",
        "",
        "Output dtypes are generated from each query's analyzed plan; the",
        "generator FAILS if any oracled gate emits a complex-typed column",
        "(the driver's canonicalizer cannot sort list/dict cells).",
        "",
        "| Query | Check | Module | Output dtypes |",
        "|---|---|---|---|",
    ]
    for name, fn in sorted(registry.QUERIES.items()):
        check = "oracle" if name in registry.ORACLES else "rows"
        mod = fn.__module__.replace("moosestack_spark.", "")
        dt = ", ".join(f"{c}:{t}" for c, t in schemas.get(name, []))
        if len(dt) > 160:
            dt = dt[:157] + "..."
        lines.append(f"| `{name}` | {check} | {mod} | {dt} |")
    lines += ["", END]
    return "\n".join(lines)


def main() -> None:
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")
    text = open(path).read()
    block = build_index()
    if BEGIN in text:
        pre = text[: text.index(BEGIN)]
        post = text[text.index(END) + len(END) :]
        text = pre + block + post
    else:
        text = text.rstrip("\n") + "\n\n" + block + "\n"
    open(path, "w").write(text)
    print("query index regenerated")


if __name__ == "__main__":
    main()
