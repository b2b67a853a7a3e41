"""Snapshot / time-travel semantics on OlapTable: per-append manifests,
read_at isolation, incremental file feed, rewrite retirement, truncate."""

from __future__ import annotations

import pytest
from pydantic import BaseModel

from moosestack_spark.catalog.table import OlapTable
from moosestack_spark.datamodel import Key


class Ev(BaseModel):
    id: Key[int]
    kind: str
    amount: float


@pytest.fixture()
def table(spark, tmp_path):
    return OlapTable("snap_events", Ev, spark, str(tmp_path / "wh"))


def _rows(i0, n, kind):
    return [{"id": i, "kind": kind, "amount": float(i)} for i in range(i0, i0 + n)]


def test_each_append_commits_a_readable_snapshot(table):
    table.insert(_rows(0, 5, "a"))
    table.insert(_rows(5, 3, "b"))
    snaps = table.snapshots()
    assert [s["version"] for s in snaps] == [1, 2]
    assert all(s["op"] == "append" for s in snaps)
    assert table.read_at(1).count() == 5
    assert table.read_at(2).count() == 8
    assert table.read().count() == 8
    # v1 is isolated from the later append
    assert {r.kind for r in table.read_at(1).collect()} == {"a"}


def test_changed_files_is_the_incremental_feed(table, spark):
    table.insert(_rows(0, 5, "a"))
    table.insert(_rows(5, 3, "b"))
    new_files = table.changed_files(1, 2)
    assert new_files and set(new_files) < set(table.snapshots()[1]["files"])
    # reading ONLY the delta files yields exactly the second batch
    import os

    paths = [os.path.join(table.path, f) for f in new_files]
    delta = spark.read.schema(table.schema).parquet(*paths)
    assert {r.kind for r in delta.collect()} == {"b"} and delta.count() == 3


def test_rewrite_retires_earlier_snapshots(table):
    table.insert(_rows(0, 5, "a"))
    table.insert(_rows(5, 5, "b"))
    deleted = table.delete_where("kind = 'a'")
    assert deleted == 5
    snaps = table.snapshots()
    assert snaps[-1]["op"] == "rewrite"
    # latest snapshot reads fine; pre-rewrite versions raise, never
    # silently return partial data
    assert table.read_at(len(snaps)).count() == 5
    with pytest.raises(FileNotFoundError, match="retired"):
        table.read_at(1)


def test_truncate_commits_empty_snapshot_keeps_history(table):
    table.insert(_rows(0, 4, "a"))
    table.truncate()
    snaps = table.snapshots()
    assert snaps[-1]["op"] == "truncate" and snaps[-1]["files"] == []
    assert table.read_at(len(snaps)).count() == 0
    assert len(snaps) == 2  # history retained (sibling dir survives rmtree)


def test_restore_rolls_back_without_copying(table):
    table.insert(_rows(0, 5, "a"))
    table.insert(_rows(5, 3, "b"))
    removed = table.restore(1)
    assert removed >= 1
    assert table.read().count() == 5
    assert {r.kind for r in table.read().collect()} == {"a"}
    snaps = table.snapshots()
    assert snaps[-1]["op"] == "restore v1"
    # restoring to a later-rewritten version fails loudly
    table.delete_where("id = 0")
    with pytest.raises(FileNotFoundError, match="retired"):
        table.restore(1)


def test_streaming_foreachbatch_appends_commit_snapshots(table, spark, tmp_path):
    """A foreachBatch stream sink lands through _append_df, so every
    micro-batch is a snapshot — free replayable history for streamed
    tables."""
    import json

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    (src_dir / "b1.json").write_text(
        "\n".join(json.dumps({"id": i, "kind": "s", "amount": 1.0}) for i in range(3))
    )
    stream = (
        spark.readStream.schema("id long, kind string, amount double")
        .json(str(src_dir))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _bid: table._append_df(df)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    snaps = table.snapshots()
    assert snaps and snaps[-1]["op"] == "append"
    assert table.read_at(len(snaps)).count() == 3
