"""The reference's minimum end-to-end slice (SURVEY.md §7): Bar model ->
OlapTable -> insert 1k rows -> MV (toDayOfMonth rollup w/ countIf) -> Api
with params order_by/limit/start_day/end_day -> rows match a DuckDB oracle.

Mirrors templates/python-tests: src/ingest/models.py:52-58 (Bar),
src/views/bar_aggregated.py:16-24 (BarAggregated MV),
src/apis/bar.py:14-87 (API params + query).
"""

from __future__ import annotations

import datetime as dt
from enum import Enum
from typing import Literal, Optional

import duckdb
import pytest
from pydantic import BaseModel, Field

from moosestack_spark.api import Api, ApiUtils, clear_apis, get_api
from moosestack_spark.catalog.materialized_view import AggSpec, IncrementalAggregateView
from moosestack_spark.catalog.table import OlapTable
from moosestack_spark.datamodel import Key
from moosestack_spark.pipeline import IngestPipeline
from moosestack_spark.sql.ch_functions import ch
from pyspark.sql import functions as F


class Baz(str, Enum):
    QUX = "QUX"
    QUUX = "QUUX"


class Bar(BaseModel):
    primary_key: Key[str]
    utc_timestamp: dt.datetime
    baz: Baz = Baz.QUX
    has_text: bool
    text_length: int


class BarApiParams(BaseModel):
    """src/apis/bar.py:14-33."""

    order_by: Literal["total_rows", "rows_with_text", "max_text_length", "total_text_length"] = (
        "total_rows"
    )
    limit: int = Field(default=5, ge=1, le=100)
    start_day: int = Field(default=1, ge=1, le=31)
    end_day: int = Field(default=31, ge=1, le=31)


def _make_rows(n: int = 1000) -> list[dict]:
    rows = []
    for i in range(n):
        ts = dt.datetime(2024, 1, 1 + (i * 7) % 28, (i * 3) % 24, i % 60)
        has_text = i % 3 != 0
        rows.append(
            {
                "primary_key": f"k{i}",
                "utc_timestamp": ts,
                "baz": "QUX" if i % 2 == 0 else "QUUX",
                "has_text": has_text,
                "text_length": (i * 13) % 100 if has_text else 0,
            }
        )
    return rows


@pytest.fixture()
def bar_table(spark, tmp_path):
    t = OlapTable("Bar", Bar, spark, str(tmp_path / "wh"))
    res = t.insert(_make_rows())
    assert res.inserted == 1000
    return t


def _bar_aggregated_view(bar_df):
    """bar_aggregated.py:16-24: GROUP BY toDayOfMonth(utc_timestamp)."""
    src = bar_df.select(
        ch.toDayOfMonth("utc_timestamp").cast("bigint").alias("day_of_month"),
        "has_text",
        "text_length",
    )
    view = IncrementalAggregateView(
        group_keys=["day_of_month"],
        aggs=[
            AggSpec("total_rows", "count"),
            AggSpec("rows_with_text", "count_if", cond=F.col("has_text")),
            AggSpec("total_text_length", "sum", expr=F.col("text_length")),
            AggSpec("max_text_length", "max", expr=F.col("text_length")),
        ],
    )
    return view.populate(src)


def test_bar_end_to_end_matches_duckdb(spark, bar_table):
    clear_apis()
    mv = _bar_aggregated_view(bar_table.read())
    mv.read().createOrReplaceTempView("bar_aggregated")

    def handler(params: BarApiParams, utils: ApiUtils):
        # bar.py:34-87: filter day range, order by the chosen metric, limit
        return (
            utils.spark.table("bar_aggregated")
            .filter(
                (F.col("day_of_month") >= params.start_day)
                & (F.col("day_of_month") <= params.end_day)
            )
            .orderBy(F.desc(params.order_by), F.asc("day_of_month"))
            .limit(params.limit)
        )

    Api("bar", BarApiParams, handler)

    got = get_api("bar").call_json(
        spark, order_by="total_text_length", limit=10, start_day=1, end_day=31
    )

    # DuckDB oracle over the same inserted rows
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE bar_rows (day_of_month BIGINT, has_text BOOLEAN, text_length BIGINT)"
    )
    con.executemany(
        "INSERT INTO bar_rows VALUES (?, ?, ?)",
        [
            (r["utc_timestamp"].day, r["has_text"], r["text_length"])
            for r in _make_rows()
        ],
    )
    want = con.execute(
        """
        SELECT day_of_month, COUNT(*) AS total_rows,
               COUNT(*) FILTER (WHERE has_text) AS rows_with_text,
               CAST(SUM(text_length) AS DOUBLE) AS total_text_length,
               MAX(text_length) AS max_text_length
        FROM bar_rows GROUP BY day_of_month
        ORDER BY total_text_length DESC, day_of_month ASC LIMIT 10
        """
    ).fetchall()

    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["day_of_month"] == w[0]
        assert g["total_rows"] == w[1]
        assert g["rows_with_text"] == w[2]
        assert float(g["total_text_length"]) == pytest.approx(w[3])
        assert g["max_text_length"] == w[4]


def test_api_param_validation(spark, bar_table):
    clear_apis()
    Api("bar2", BarApiParams, lambda p, u: u.spark.range(1))
    with pytest.raises(Exception):
        get_api("bar2").call(spark, limit=1000)  # le=100
    with pytest.raises(Exception):
        get_api("bar2").call(spark, order_by="nonsense")


def test_api_versioning(spark):
    clear_apis()
    Api("v", BarApiParams, lambda p, u: u.spark.range(1))
    Api("v", BarApiParams, lambda p, u: u.spark.range(2), version="2.0")
    assert get_api("v", "2.0").version == "2.0"
    assert get_api("v", "9.9").version is None  # falls back to unversioned
    assert get_api("v").version is None


def test_ingest_pipeline_with_dlq(spark, tmp_path):
    p = IngestPipeline("BarPipe", Bar, spark, str(tmp_path / "wh2"))
    res = p.ingest(
        [
            {
                "primary_key": "a",
                "utc_timestamp": dt.datetime(2024, 1, 1),
                "baz": "QUX",
                "has_text": True,
                "text_length": 5,
            },
            {"primary_key": "bad", "utc_timestamp": "not-a-date", "baz": "NOPE"},
        ]
    )
    assert res == {"inserted": 1, "dead_lettered": 1}
    assert p.table.read().count() == 1
    dlq = p.read_dlq().collect()
    assert len(dlq) == 1
    assert dlq[0].source == "api"
    assert dlq[0].error_type == "ValidationError"
    assert "bad" in dlq[0].original_record
