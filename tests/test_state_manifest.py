"""Resumable partition-addressed output: atomic writes, manifests,
resume-skip, fingerprint stability."""

import json
import os

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.state.manifest import (
    MANIFEST_DIR,
    PartitionedRunner,
    partition_documents_path,
)

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def build_counter():
    calls = []

    def build(part):
        calls.append(part["pid"])
        lo, hi = part["row_range"]
        return rd.from_arrow(
            pa.table({"x": list(range(lo, hi)), "part": [part["pid"]] * (hi - lo)})
        )

    return build, calls


PARTS = [
    {"pid": "00000", "inputs": ["a"], "row_range": (0, 10)},
    {"pid": "00001", "inputs": ["b"], "row_range": (10, 20)},
    {"pid": "00002", "inputs": ["c"], "row_range": (20, 30)},
]


class TestPartitionedRunner:
    def test_fresh_run_writes_all(self, tmp_path):
        runner = PartitionedRunner(str(tmp_path / "out"))
        build, calls = build_counter()
        summary = runner.run(PARTS, build)
        assert summary["ran"] == ["00000", "00001", "00002"]
        assert sorted(calls) == ["00000", "00001", "00002"]
        for pid in calls:
            assert os.path.isdir(tmp_path / "out" / f"part={pid}")
            m = json.load(open(tmp_path / "out" / MANIFEST_DIR / f"{pid}.json"))
            assert m["row_count"] == 10
            assert m["schema"] == ["x", "part"]
            assert len(m["fingerprint"]) == 16

    def test_resume_skips_completed(self, tmp_path):
        runner = PartitionedRunner(str(tmp_path / "out"))
        build, calls = build_counter()
        runner.run(PARTS, build)
        # simulate a lost partition: delete manifest 1 (data may remain)
        os.remove(tmp_path / "out" / MANIFEST_DIR / "00001.json")
        build2, calls2 = build_counter()
        summary = runner.run(PARTS, build2)
        assert summary["skipped"] == ["00000", "00002"]
        assert summary["ran"] == ["00001"]
        assert calls2 == ["00001"]  # only the lost partition recomputed

    def test_fingerprint_matches_fresh_run(self, tmp_path):
        r1 = PartitionedRunner(str(tmp_path / "a"))
        r2 = PartitionedRunner(str(tmp_path / "b"))
        build, _ = build_counter()
        r1.run(PARTS, build)
        build2, _ = build_counter()
        r2.run(PARTS, build2)
        f1 = {p: m.fingerprint for p, m in r1.completed().items()}
        f2 = {p: m.fingerprint for p, m in r2.completed().items()}
        assert f1 == f2  # deterministic content across runs

    def test_corrupt_manifest_triggers_rebuild(self, tmp_path):
        runner = PartitionedRunner(str(tmp_path / "out"))
        build, _ = build_counter()
        runner.run(PARTS, build)
        with open(tmp_path / "out" / MANIFEST_DIR / "00002.json", "w") as f:
            f.write("{ not json")
        build2, calls2 = build_counter()
        summary = runner.run(PARTS, build2)
        assert summary["ran"] == ["00002"]


def test_partition_documents_path():
    parts = partition_documents_path("/root/testdata/sf0.001", 4)
    assert len(parts) == 4
    assert parts[0]["row_range"] == (0, 125)
    assert parts[-1]["row_range"][1] == 500
    assert all(p["inputs"] for p in parts)


class TestResumeSafety:
    def test_changed_inputs_force_rebuild(self, tmp_path):
        """ADVICE r1: a pid whose manifest inputs differ from the current
        plan (e.g. different n_partitions over regenerated input) must be
        rebuilt, not silently reused."""
        runner = PartitionedRunner(str(tmp_path / "out"))
        build, _ = build_counter()
        runner.run(PARTS, build)
        changed = [dict(PARTS[0], inputs=["a-v2"]), PARTS[1], PARTS[2]]
        build2, calls2 = build_counter()
        summary = runner.run(changed, build2)
        assert summary["ran"] == ["00000"]
        assert calls2 == ["00000"]
        m = json.load(open(tmp_path / "out" / MANIFEST_DIR / "00000.json"))
        assert m["inputs"] == ["a-v2"]

    def test_leaked_tmp_dirs_swept(self, tmp_path):
        """ADVICE r1: part=<pid>.tmp-<uuid> dirs from a crashed run must
        not survive into the next run's output tree (they'd match part=*
        globs and double-count rows)."""
        out = tmp_path / "out"
        runner = PartitionedRunner(str(out))
        leak = out / "part=00001.tmp-deadbeef"
        leak.mkdir()
        (leak / "junk.parquet").write_bytes(b"")
        build, _ = build_counter()
        runner.run(PARTS, build)
        assert not leak.exists()
        assert sorted(
            n for n in os.listdir(out) if n.startswith("part=")
        ) == ["part=00000", "part=00001", "part=00002"]


class TestZeroRowPartition:
    def test_empty_partition_completes_and_resumes(self, tmp_path):
        """A partition whose build yields ZERO rows must still complete
        (empty dir + manifest with row_count 0) and be skipped on
        resume — write_parquet creates no files and no directory for an
        empty dataset (measured: the sf0.001 resumable-funnel soak
        crashed on os.listdir of the missing tmp dir)."""

        def build(part):
            t = pa.table({"x": list(range(10))})
            if part["pid"] == "00001":
                return rd.from_arrow(t).filter(lambda r: False)
            return rd.from_arrow(t)

        parts = [
            {"pid": "00000", "inputs": ["a"]},
            {"pid": "00001", "inputs": ["b"]},
        ]
        runner = PartitionedRunner(str(tmp_path / "out"))
        summary = runner.run(parts, build)
        assert summary["ran"] == ["00000", "00001"]
        assert os.path.isdir(tmp_path / "out" / "part=00001")
        m = json.load(open(tmp_path / "out" / MANIFEST_DIR / "00001.json"))
        assert m["row_count"] == 0 and m["schema"] == []
        # resume must skip BOTH, including the empty one
        summary2 = runner.run(parts, build)
        assert summary2["skipped"] == ["00000", "00001"]
        assert summary2["ran"] == []
