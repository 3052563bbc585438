"""End-to-end resumable flagship: partitioned output, resume-skip,
fingerprint equality with a fresh run."""

import json
import os

import pyarrow.parquet as pq
import pytest

from textalyzer_ray.pipelines.resumable import resumable_flagship
from textalyzer_ray.state.manifest import MANIFEST_DIR

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF = "/root/testdata/sf0.001"


class TestResumableFlagship:
    def test_full_run_then_resume(self, tmp_path):
        out = str(tmp_path / "run")
        s1 = resumable_flagship(SF, out, n_partitions=4)
        assert s1["ran"] == ["00000", "00001", "00002", "00003"]
        total = sum(m["row_count"] for m in s1["manifests"].values())
        assert total == 500

        # output is readable partitioned parquet with the metric schema
        part0 = os.path.join(out, "part=00000")
        t = pq.read_table(part0)
        for col in ("doc_id", "text", "flesch_reading_ease", "quality_score"):
            assert col in t.schema.names

        # lose one partition's manifest -> only that partition reruns
        os.remove(os.path.join(out, MANIFEST_DIR, "00002.json"))
        s2 = resumable_flagship(SF, out, n_partitions=4)
        assert s2["ran"] == ["00002"]
        assert s2["skipped"] == ["00000", "00001", "00003"]
        # recomputed partition is bit-equivalent (same fingerprint)
        assert s2["manifests"]["00002"]["fingerprint"] == s1["manifests"][
            "00002"
        ]["fingerprint"]

    def test_fresh_run_fingerprints_match(self, tmp_path):
        s1 = resumable_flagship(SF, str(tmp_path / "a"), n_partitions=2)
        s2 = resumable_flagship(SF, str(tmp_path / "b"), n_partitions=2)
        assert {p: m["fingerprint"] for p, m in s1["manifests"].items()} == {
            p: m["fingerprint"] for p, m in s2["manifests"].items()
        }
