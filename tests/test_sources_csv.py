"""CSV shard source: quoted round trip incl. commas/quotes/newlines."""

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.sources.tables import read_csv_shards, write_csv_shards

pytestmark = pytest.mark.usefixtures("quiet_data_context")


ADVERSARIAL = [
    (0, "plain text"),
    (1, "comma, separated, values"),
    (2, 'quotes "inside" the field'),
    (3, "embedded\nnewline\nlines"),
    (4, 'all of it: "a,b"\n"c,d"'),
    (5, ""),
    (6, " leading and trailing "),
]


class TestCsvRoundTrip:
    def test_adversarial_round_trip(self, tmp_path):
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in ADVERSARIAL], pa.int64()),
                "text": [r[1] for r in ADVERSARIAL],
            }
        )
        n = write_csv_shards(str(tmp_path), t, n_shards=3)
        assert n == len(ADVERSARIAL)
        back = read_csv_shards(str(tmp_path)).sort("doc_id").take_all()
        got = [(r["doc_id"], r["text"]) for r in back]
        assert got == ADVERSARIAL

    def test_column_prune_and_shard_count(self, tmp_path):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["a", "b"],
                "extra": ["x", "y"],
            }
        )
        write_csv_shards(str(tmp_path), t, n_shards=2)
        import os

        assert sorted(os.listdir(tmp_path)) == ["part-0.csv", "part-1.csv"]
        back = read_csv_shards(str(tmp_path), columns=["doc_id"]).take_all()
        assert sorted(r["doc_id"] for r in back) == [1, 2]
        assert set(back[0]) == {"doc_id"}
