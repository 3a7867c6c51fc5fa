"""Wave-112 properties: the rowlog STREAM writer's per-batch two-phase
commit — each batch id publishes its own manifest, a replayed batch
OVERWRITES (never duplicates) its manifest, and abort retracts task
files without touching committed batches."""

from __future__ import annotations

import json
import os

from pyspark.sql import Row

from angelo_bravo_etl_task_spark.sources.pydatasource import (
    RowLogStreamWriter,
)


def test_stream_writer_per_batch_manifests(tmp_path):
    w = RowLogStreamWriter({"path": str(tmp_path)})
    m0 = w.write(iter([Row(a=1), Row(a=2)]))
    w.commit([m0], 0)
    m1 = w.write(iter([Row(a=3)]))
    w.commit([m1], 1)

    man0 = json.load(open(tmp_path / "_manifest-0.json"))
    man1 = json.load(open(tmp_path / "_manifest-1.json"))
    assert man0 == {"batch_id": 0, "files": [m0.filename], "total_rows": 2}
    assert man1 == {"batch_id": 1, "files": [m1.filename], "total_rows": 1}


def test_stream_writer_replay_overwrites_not_duplicates(tmp_path):
    """The exactly-once property: re-committing the SAME batch id (the
    restart/replay path) replaces that batch's manifest — total published
    rows stay those of ONE attempt, and no second manifest appears."""
    w = RowLogStreamWriter({"path": str(tmp_path)})
    first = w.write(iter([Row(a=1), Row(a=2)]))
    w.commit([first], 7)
    replay = w.write(iter([Row(a=1), Row(a=2)]))
    w.commit([replay], 7)

    manifests = [f for f in os.listdir(tmp_path) if f.startswith("_manifest")]
    assert manifests == ["_manifest-7.json"]
    man = json.load(open(tmp_path / "_manifest-7.json"))
    assert man["files"] == [replay.filename] and man["total_rows"] == 2


def test_stream_writer_abort_retracts_only_its_batch(tmp_path):
    w = RowLogStreamWriter({"path": str(tmp_path)})
    committed = w.write(iter([Row(a=1)]))
    w.commit([committed], 0)
    failed = w.write(iter([Row(a=2)]))
    w.abort([failed], 1)

    assert not os.path.exists(tmp_path / failed.filename)
    assert os.path.exists(tmp_path / committed.filename)
    assert not os.path.exists(tmp_path / "_manifest-1.json")
