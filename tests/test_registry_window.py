"""Registry-window invariants: the driver's correctness gate checks only
the FIRST 50 registered queries, so _WINDOW_PRIORITY is load-bearing.
These checks catch the mistakes that would silently waste a round:
a priority list that isn't exactly 50, names that don't resolve, dupes,
or an oracled query that has neither a prior green row nor a slot."""

from __future__ import annotations

import json
import os

from moosestack_spark import registry

registry.load_all()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_from_prior_rounds() -> set[str]:
    green: set[str] = set()
    for fname in sorted(os.listdir(_REPO)):
        if fname.startswith("CORRECTNESS_r") and fname.endswith(".json"):
            try:
                data = json.load(open(os.path.join(_REPO, fname)))
            except Exception:
                continue
            green |= {n for n, v in data.items() if isinstance(v, dict) and v.get("hash_match")}
    return green


def test_window_priority_is_exactly_50_registered_unique():
    prio = registry._WINDOW_PRIORITY
    assert len(prio) == 50, f"window priority must be exactly 50, got {len(prio)}"
    assert len(set(prio)) == 50, "duplicate names in window priority"
    unknown = [n for n in prio if n not in registry.QUERIES]
    assert not unknown, f"priority names not registered: {unknown}"


def test_window_comes_first_in_registry_order():
    first50 = list(registry.QUERIES)[:50]
    assert set(first50) == set(registry._WINDOW_PRIORITY)


def test_every_oracled_query_has_green_row_or_window_slot():
    green = _green_from_prior_rounds()
    window = set(list(registry.QUERIES)[:50])
    backlog = set(registry._AFTER_WINDOW)
    uncovered = [n for n in registry.ORACLES if n not in green and n not in window]
    assert set(uncovered) <= backlog, (
        f"oracled queries with no prior green row, no window slot, and no "
        f"explicit _AFTER_WINDOW backlog entry: {sorted(set(uncovered) - backlog)} "
        "— rotate them into _WINDOW_PRIORITY (or queue them in _AFTER_WINDOW) "
        "or they never get checked"
    )
    # the backlog must sit immediately after the window so it is the first
    # thing a wider driver check or next round's rotation picks up
    after = list(registry.QUERIES)[50 : 50 + len(registry._AFTER_WINDOW)]
    assert after == registry._AFTER_WINDOW


def test_every_query_callable_and_every_oracle_has_query():
    assert set(registry.ORACLES) <= set(registry.QUERIES)
    for name, fn in registry.QUERIES.items():
        assert callable(fn), name
