"""Frozen adversarial extraction corpus: the engine must reproduce the
pinned expected bytes for 50 hand-written pages (non-circular
conformance — pages are NOT generated from their expected text)."""

import os
import sys

import pyarrow.parquet as pq

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "extraction")


def test_fixture_corpus_byte_exact():
    sys.path.insert(0, FIXDIR)
    try:
        import make_fixtures
    finally:
        sys.path.remove(FIXDIR)
    frozen = pq.read_table(make_fixtures.OUT)
    fresh = make_fixtures.build()
    assert fresh.equals(frozen), "extraction drifted from frozen fixtures"
    assert frozen.num_rows == 50
    d = dict(zip(frozen["page_id"].to_pylist(), frozen["ok"].to_pylist()))
    assert not d["p46_nul_byte_binary"] and not d["p47_invalid_utf8"]
    assert sum(d.values()) == 46  # 4 deliberate drops
