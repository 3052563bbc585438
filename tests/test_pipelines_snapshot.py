"""Snapshot diff: all four statuses, unicode digests, partitioning
invariance, empty sides."""

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.snapshot import snapshot_diff

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


class TestSnapshotDiff:
    def test_all_statuses(self):
        a = ds([(0, "same"), (1, "old"), (2, "gone"), (3, "")])
        b = ds([(0, "same"), (1, "new"), (4, "fresh"), (3, "")])
        for parts in (1, 3):
            got = snapshot_diff(
                a.repartition(parts), b.repartition(parts)
            ).take_all()
            assert got == [
                {"doc_id": 0, "status": "unchanged"},
                {"doc_id": 1, "status": "changed"},
                {"doc_id": 2, "status": "removed"},
                {"doc_id": 3, "status": "unchanged"},
                {"doc_id": 4, "status": "added"},
            ]

    def test_unicode_and_near_identical(self):
        # NFC vs NFD must read as changed (byte-level contract)
        a = ds([(0, "cafe\u0301"), (1, "x" * 10_000)])
        b = ds([(0, "caf\u00e9"), (1, "x" * 10_000 + "y")])
        got = snapshot_diff(a, b).take_all()
        assert got == [
            {"doc_id": 0, "status": "changed"},
            {"doc_id": 1, "status": "changed"},
        ]

    def test_empty_sides(self):
        e = ds([])
        x = ds([(7, "only")])
        assert snapshot_diff(e, x).take_all() == [
            {"doc_id": 7, "status": "added"}
        ]
        assert snapshot_diff(x, e).take_all() == [
            {"doc_id": 7, "status": "removed"}
        ]
        assert snapshot_diff(e, e).take_all() == []
