"""WARC source: spec round-trip, resilience, Ray reader."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from textalyzer_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc_file,
)

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def test_roundtrip(tmp_path):
    recs = [
        ("https://a.example/1", 1_700_000_000_000_000, b"<html>one</html>"),
        ("https://a.example/2", 1_700_000_001_500_000, b"<html>two</html>"),
    ]
    p = str(tmp_path / "shard.warc")
    assert write_warc_file(p, recs) == 2
    t = parse_warc_bytes(open(p, "rb").read())
    assert t["url"].to_pylist() == [r[0] for r in recs]
    assert t["html"].to_pylist() == [r[2] for r in recs]
    # WARC-Date is second-precision: microsecond fraction truncated.
    # Compare naive datetimes (pa.timestamp('us') is tz-naive; calling
    # .timestamp() would shift by the box's local timezone)
    import datetime as _dt

    def _naive(sec):
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=sec)

    assert t["warc_ts"].to_pylist()[0] == _naive(1_700_000_000)
    assert t["warc_ts"].to_pylist()[1] == _naive(1_700_000_001)


def test_binary_payload_with_fake_record_marker(tmp_path):
    # payload containing "WARC/1.0" must not desync the length-driven scan
    evil = b"<html>WARC/1.0\r\nWARC-Type: response\r\n\r\nfake</html>"
    p = str(tmp_path / "evil.warc")
    write_warc_file(p, [("https://x/1", 0, evil), ("https://x/2", 0, b"ok")])
    t = parse_warc_bytes(open(p, "rb").read())
    assert t["html"].to_pylist() == [evil, b"ok"]


def test_truncated_shard_yields_prefix(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc_file(p, [("https://x/1", 0, b"aaaa"), ("https://x/2", 0, b"bbbb")])
    data = open(p, "rb").read()
    t = parse_warc_bytes(data[: len(data) - 30])  # cut inside last record
    assert t["url"].to_pylist() == ["https://x/1"]


def test_read_warc_extraction_byte_identity(tmp_path):
    # synthesize shards from real testdata pages; extracted text must be
    # byte-identical to documents.text (the north-rule invariant)
    from textalyzer_ray.pipelines.extraction import page_metrics
    from textalyzer_ray.sources.webgen import pages_from_documents

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"],
    )
    pages = pages_from_documents(docs)
    # two shards, interleaved
    for shard in (0, 1):
        write_warc_file(
            str(tmp_path / f"part-{shard}.warc"),
            [
                (u, ts.value if hasattr(ts, "value") else ts, h)
                for i, (u, ts, h) in enumerate(
                    zip(
                        pages["url"].to_pylist(),
                        pages["warc_ts"].combine_chunks().cast(pa.int64()).to_pylist(),
                        pages["html"].to_pylist(),
                    )
                )
                if i % 2 == shard
            ],
        )
    ds = read_warc(str(tmp_path))
    assert ds.count() == docs.num_rows
    rows = page_metrics(ds, concurrency=2).take_all()
    orig = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    assert len(rows) == len(orig)
    for r in rows:
        did = int(r["url"].rsplit("/", 1)[1])
        assert r["text"] == orig[did]


def test_write_warc_shards_roundtrip(tmp_path):
    import ray.data as rd

    from textalyzer_ray.sources.warc import write_warc_shards
    from textalyzer_ray.sources.webgen import pages_from_documents

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"],
    )
    pages = pages_from_documents(docs).select(["url", "warc_ts", "html"])
    ds = rd.from_arrow(pages).repartition(3)
    out = str(tmp_path / "rewritten")
    n = write_warc_shards(ds, out)
    assert n == docs.num_rows
    back = read_warc(out)
    got = {r["url"]: r["html"] for r in back.take_all()}
    exp = dict(zip(pages["url"].to_pylist(), pages["html"].to_pylist()))
    assert got == exp
    # idempotence: same pipeline -> same shard names, no accumulation
    import os

    before = sorted(os.listdir(out))
    assert write_warc_shards(rd.from_arrow(pages).repartition(3), out) == n
    assert sorted(os.listdir(out)) == before


def test_read_warc_gz_member_per_record(tmp_path):
    """Common Crawl layout: each WARC record its own gzip member."""
    import gzip

    from textalyzer_ray.sources.warc import write_warc_file

    plain = str(tmp_path / "src.warc")
    recs = [
        ("https://g.example/1", 0, b"<html>one</html>"),
        ("https://g.example/2", 1_000_000, b"<html>two</html>"),
    ]
    write_warc_file(plain, recs)
    data = open(plain, "rb").read()
    assert parse_warc_bytes(data).num_rows == 2  # sanity
    # two concatenated gzip members (split at an arbitrary byte — the
    # reader must treat the stream as one logical file)
    mid = len(data) // 2
    gz = gzip.compress(data[:mid]) + gzip.compress(data[mid:])
    gz_path = str(tmp_path / "cc.warc.gz")
    open(gz_path, "wb").write(gz)
    ds = read_warc(str(tmp_path / "cc.warc.gz"))
    rows = {r["url"]: r["html"] for r in ds.take_all()}
    assert rows == {u: h for u, _, h in recs}


def test_sink_durability_contract(tmp_path):
    """Collision-free names with duplicate URLs, stale-shard sweep on
    rerun with different partitioning, null tolerance."""
    import os

    import ray.data as rd

    from textalyzer_ray.sources.warc import write_warc_shards

    t = pa.table(
        {
            "url": ["https://d/x"] * 6,  # duplicate urls everywhere
            "warc_ts": pa.array([None, 1, 2, 3, 4, 5], pa.timestamp("us")),
            "html": [b"a", b"bb", b"ccc", b"d", b"ee", None],
        }
    )
    out = str(tmp_path / "sink")
    n = write_warc_shards(rd.from_arrow(t).repartition(3), out)
    assert n == 6
    rows = read_warc(out).take_all()
    assert len(rows) == 6  # no shard-name collision lost records
    # rerun with DIFFERENT block boundaries: no stale accumulation
    assert write_warc_shards(rd.from_arrow(t).repartition(2), out) == 6
    assert read_warc(out).count() == 6
    assert not [f for f in os.listdir(out) if ".tmp-" in f]


def test_sink_names_distinguish_content_and_ts(tmp_path):
    """r3 ADVICE fix: blocks agreeing on (url, len(html)) per row but
    differing in bytes or timestamp (recrawl of a same-size page) must
    land on DIFFERENT shard names — clean=False must keep both."""
    import os

    import ray.data as rd

    from textalyzer_ray.sources.warc import write_warc_shards

    out = str(tmp_path / "sink")
    a = pa.table(
        {
            "url": ["https://d/x"],
            "warc_ts": pa.array([1], pa.timestamp("us")),
            "html": [b"aaaa"],
        }
    )
    b_bytes = a.set_column(2, "html", pa.array([b"bbbb"], pa.binary()))
    b_ts = a.set_column(1, "warc_ts", pa.array([2], pa.timestamp("us")))
    assert write_warc_shards(rd.from_arrow(a), out) == 1
    assert write_warc_shards(rd.from_arrow(b_bytes), out, clean=False) == 1
    assert write_warc_shards(rd.from_arrow(b_ts), out, clean=False) == 1
    shards = [f for f in os.listdir(out) if f.endswith(".warc")]
    assert len(shards) == 3  # no silent overwrite
    assert read_warc(out).count() == 3


def test_gz_trailing_junk_salvage(tmp_path):
    import gzip

    from textalyzer_ray.sources.warc import write_warc_file

    p = str(tmp_path / "s.warc")
    write_warc_file(p, [("https://j/1", 0, b"ok1"), ("https://j/2", 0, b"ok2")])
    data = open(p, "rb").read()
    gz = gzip.compress(data) + b"\x00" * 64  # zero padding after last member
    open(str(tmp_path / "s.warc.gz"), "wb").write(gz)
    os_path = str(tmp_path / "s.warc.gz")
    t = read_warc(os_path).take_all()
    assert [r["url"] for r in t] == ["https://j/1", "https://j/2"]


def test_gz_extension_filter(tmp_path):
    import gzip
    import json

    from textalyzer_ray.sources.warc import write_warc_file

    sub = tmp_path / "mixed"
    sub.mkdir()
    write_warc_file(str(sub / "a.warc"), [("https://m/1", 0, b"x")])
    # decoy non-WARC gz must not be swallowed
    (sub / "logs.json.gz").write_bytes(gzip.compress(json.dumps({"a": 1}).encode()))
    rows = read_warc(str(sub)).take_all()
    assert [r["url"] for r in rows] == ["https://m/1"]


class TestWarcFuzz:
    def test_arbitrary_bytes_never_crash(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from textalyzer_ray.sources.warc import parse_warc_bytes

        @settings(max_examples=200, deadline=None)
        @given(st.binary(max_size=2048))
        def run(data):
            t = parse_warc_bytes(data)  # must return, never raise
            assert t.num_rows >= 0

        run()

    def test_arbitrary_records_roundtrip(self, tmp_path):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from textalyzer_ray.sources.warc import (
            parse_warc_bytes,
            write_warc_file,
        )

        # exclude CR/LF (framing) and trailing SP/HTAB (the spec's OWS
        # trim makes those unround-trippable by design)
        url_st = st.text(
            alphabet=st.characters(
                codec="ascii", exclude_characters="\r\n"
            ),
            max_size=50,
        ).map(lambda s: "https://f.example/" + s.rstrip(" \t"))

        @settings(max_examples=50, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    url_st,
                    st.integers(min_value=0, max_value=2**48),
                    st.binary(max_size=512),  # any payload incl. CRLFs
                ),
                max_size=5,
            )
        )
        def run(recs):
            p = str(tmp_path / "fuzz.warc")
            write_warc_file(p, recs)
            t = parse_warc_bytes(open(p, "rb").read())
            assert t["url"].to_pylist() == [r[0] for r in recs]
            assert t["html"].to_pylist() == [r[2] for r in recs]
            # WARC-Date truncates to seconds; compare tz-naive
            import datetime as _dt

            exp = [
                _dt.datetime(1970, 1, 1)
                + _dt.timedelta(seconds=r[1] // 1_000_000)
                for r in recs
            ]
            assert t["warc_ts"].to_pylist() == exp

        run()


def test_negative_content_length_terminates():
    from textalyzer_ray.sources.warc import parse_warc_bytes

    # int() accepts b"-37"; the scan must stop, not loop forever
    assert parse_warc_bytes(b"WARC/1.0\r\nContent-Length: -37\r\n\r\n").num_rows == 0
    assert parse_warc_bytes(b"WARC/1.0\r\nContent-Length: +5\r\n\r\nabcde\r\n\r\n").num_rows == 0
