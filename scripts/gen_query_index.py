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


def build_index() -> str:
    from moosestack_spark import registry

    registry.load_all()
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
        "| Query | Check | Module |",
        "|---|---|---|",
    ]
    for name, fn in sorted(registry.QUERIES.items()):
        check = "oracle" if name in registry.ORACLES else "rows"
        mod = fn.__module__.replace("moosestack_spark.", "")
        lines.append(f"| `{name}` | {check} | {mod} |")
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
