"""Ray pipeline tests: word histogram, line length, extraction,
analytics — each checked against the pure-Python oracle."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from textalyzer_ray.core.textmetrics import (
    display_width,
    frequency_map,
    split_lines,
    tokenize,
)
from textalyzer_ray.pipelines.analytics import (
    events_tumbling_window,
    lang_rollup,
    token_counts,
    top_k_longest,
)
from textalyzer_ray.pipelines.extraction import drop_stats, extract_pages, page_metrics
from textalyzer_ray.pipelines.frequency import word_histogram, word_histogram_by_lang
from textalyzer_ray.pipelines.line_length import line_length_histogram
from textalyzer_ray.sources.webgen import synth_corpus

pytestmark = pytest.mark.usefixtures("quiet_data_context")

DOCS = [
    "This test is a test to test the frequency map.",
    "Hello World! A warm welcome to the world.",
    "line one here\nline two follows\n\nfinal line",
    "",
    "你好 世界 你好",
]


def docs_ds():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": list(range(len(DOCS))),
                "text": DOCS,
                "lang": ["en", "en", "en", "en", "zh"],
                "n_chars": [len(t) for t in DOCS],
            }
        )
    )


def oracle_histogram(texts):
    freq = {}
    for t in texts:
        for w, c in frequency_map(t).items():
            freq[w] = freq.get(w, 0) + c
    return sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))


class TestWordHistogram:
    def test_matches_oracle_and_order(self):
        rows = word_histogram(docs_ds()).take_all()
        got = [(r["word"], r["count"]) for r in rows]
        assert got == oracle_histogram(DOCS)

    def test_salted_same_result(self):
        plain = word_histogram(docs_ds()).take_all()
        salted = word_histogram(docs_ds(), salted=True).take_all()
        assert [(r["word"], r["count"]) for r in plain] == [
            (r["word"], r["count"]) for r in salted
        ]

    def test_key_counts_auto_distributed_same_result(self):
        """r3 auto-probe: forcing auto_threshold=0 routes key_counts
        through the key-aligned final merge; counts must equal the tree
        path's and the result must arrive in >1 partition-ready form."""
        from textalyzer_ray.stages.groups import key_counts
        from textalyzer_ray.stages.tokenize import partial_word_counts

        def partials():
            return docs_ds().map_batches(
                lambda t: partial_word_counts(t, "text"),
                batch_format="pyarrow",
            )

        tree = {
            (r["word"], r["sum_count"])
            for r in key_counts(
                partials(), ["word"], sum_cols=["count"], distributed=False
            ).take_all()
        }
        auto_dist = {
            (r["word"], r["sum_count"])
            for r in key_counts(
                partials(), ["word"], sum_cols=["count"], auto_threshold=0
            ).take_all()
        }
        assert auto_dist == tree and len(tree) > 0

    def test_by_lang(self):
        rows = word_histogram_by_lang(docs_ds()).take_all()
        zh = [(r["word"], r["count"]) for r in rows if r["lang"] == "zh"]
        assert zh == [("你好", 2), ("世界", 1)]


class TestLineLength:
    def test_matches_oracle(self):
        rows = line_length_histogram(docs_ds()).take_all()
        got = {r["length"]: r["count"] for r in rows}
        expected = {}
        for t in DOCS:
            for line in split_lines(t):
                w = display_width(line)
                expected[w] = expected.get(w, 0) + 1
        assert got == expected
        lengths = [r["length"] for r in rows]
        assert lengths == sorted(lengths)  # O5 ascending order

    def test_reference_vector(self):
        ds = rd.from_items(
            [{"text": "line1\nline22\n"}, {"text": "line1\nline333\n"}]
        )
        rows = line_length_histogram(ds).take_all()
        assert {r["length"]: r["count"] for r in rows} == {5: 2, 6: 1, 7: 1}


class TestExtraction:
    def test_byte_identical_and_drop_counters(self):
        tbl = synth_corpus(40, seed=11, invalid_every=8)
        ds = rd.from_arrow(tbl)
        out = extract_pages(ds, keep_only_valid=False, concurrency=2)
        stats = drop_stats(out)
        assert stats.get("binary", 0) + stats.get("invalid_utf8", 0) == 5
        ok_rows = extract_pages(ds, concurrency=2).take_all()
        expected = {
            u: t for u, t in zip(tbl["url"].to_pylist(), tbl["text"].to_pylist()) if t
        }
        assert len(ok_rows) == len(expected)
        for r in ok_rows:
            assert r["text"] == expected[r["url"]]  # byte-identical per url

    def test_page_metrics_schema(self):
        ds = rd.from_arrow(synth_corpus(10, seed=2))
        rows = page_metrics(ds, concurrency=2).take_all()
        assert len(rows) == 10
        r = rows[0]
        for col in (
            "url",
            "text",
            "n_words",
            "n_syllables",
            "flesch_reading_ease",
            "n_tokens",
            "quality_score",
        ):
            assert col in r
        assert r["n_words"] == r["n_tokens"] == len(r["text"].split())


class TestAnalytics:
    def test_lang_rollup(self):
        rows = lang_rollup(docs_ds()).take_all()
        en = next(r for r in rows if r["lang"] == "en")
        assert en["n_docs"] == 4
        assert en["total_chars"] == sum(len(t) for t in DOCS[:4])

    def test_top_k(self):
        rows = top_k_longest(docs_ds(), k=2).take_all()
        assert [r["doc_id"] for r in rows] == [0, 2]

    def test_token_counts(self):
        rows = token_counts(docs_ds()).take_all()
        got = {r["doc_id"]: r["n_tokens"] for r in rows}
        assert got == {i: len(tokenize(t)) for i, t in enumerate(DOCS)}

    def test_events_window(self):
        base = 1_577_836_800_000_000  # 2020-01-01T00:00:00 in epoch-us
        ts = [base + i * 20 * 60 * 1_000_000 for i in range(12)]
        ds = rd.from_arrow(
            pa.table(
                {
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "event_type": ["a", "b"] * 6,
                    "value": [float(i) for i in range(12)],
                }
            )
        )
        rows = events_tumbling_window(ds, window_s=3600).take_all()
        # 12 events over 4h, 2 types x alternating -> type a in hours 0..3
        a_rows = [r for r in rows if r["event_type"] == "a"]
        assert sum(r["n_events"] for r in a_rows) == 6
        assert len(a_rows) == 4


class TestHoppingWindow:
    def test_each_event_in_window_over_hop_windows(self, quiet_data_context):
        import datetime as dt

        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.analytics import events_hopping_window

        t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
        t = pa.table(
            {
                "ts": pa.array([t0], pa.timestamp("us")),
                "event_type": ["view"],
                "value": [2.0],
            }
        )
        rows = events_hopping_window(
            rd.from_arrow(t), window_s=3600, hop_s=900
        ).take_all()
        starts = sorted(r["window_start"] for r in rows)
        # event at 10:00 belongs to windows starting 09:15..10:00
        assert starts == [
            dt.datetime(2024, 1, 1, 9, 15),
            dt.datetime(2024, 1, 1, 9, 30),
            dt.datetime(2024, 1, 1, 9, 45),
            dt.datetime(2024, 1, 1, 10, 0),
        ]
        assert all(r["n_events"] == 1 and r["sum_value"] == 2.0 for r in rows)

    def test_rejects_non_divisible_hop(self):
        import pytest

        from textalyzer_ray.pipelines.analytics import events_hopping_window

        with pytest.raises(ValueError):
            events_hopping_window(None, window_s=3600, hop_s=700)


class TestColumnQuantiles:
    def test_exact_vs_numpy(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.analytics import column_quantiles

        rng = np.random.RandomState(5)
        v = rng.randint(0, 300, size=5000)
        ds = rd.from_arrow(pa.table({"x": pa.array(v, pa.int64())})).repartition(7)
        qs = [0.0, 0.5, 0.95, 1.0]
        t = column_quantiles(ds, "x", qs)
        got = dict(zip(t["q"].to_pylist(), t["value"].to_pylist()))
        sv = np.sort(v)
        import math

        exp = {q: int(sv[max(1, math.ceil(q * len(sv))) - 1]) for q in qs}
        assert got == exp

    def test_empty(self):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.analytics import column_quantiles

        ds = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
        t = column_quantiles(ds, "x", [0.5])
        assert t.num_rows == 0


class TestRangeJoin:
    def test_band_semantics(self):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.joins import range_join_by_key

        US = 1_000_000

        def evs(rows):
            return rd.from_arrow(
                pa.table(
                    {
                        "event_id": pa.array([r[0] for r in rows], pa.int64()),
                        "ts": pa.array(
                            [r[1] * US for r in rows], pa.timestamp("us")
                        ),
                        "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    }
                )
            )

        left = evs([(1, 100, 7), (2, 500, 7), (3, 100, 8)])
        right = evs(
            [
                (10, 40, 7),   # 60s before left 1 -> in band (<=60)
                (11, 100, 7),  # same instant -> in (upper inclusive 0)
                (12, 101, 7),  # after -> out
                (13, 39, 7),   # 61s before -> out
                (14, 100, 9),  # other user -> out
                (15, 95, 8),   # user 8, 5s before left 3 -> in
            ]
        )
        got = [
            (r["event_id"], r["event_id_right"])
            for r in range_join_by_key(
                left, right, key="user_id", lower_s=60, upper_s=0
            ).take_all()
        ]
        assert got == [(1, 10), (1, 11), (3, 15)]


class TestRangeJoinEmpty:
    def test_empty_sides(self):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.joins import range_join_by_key

        def evs(rows):
            return rd.from_arrow(
                pa.table(
                    {
                        "event_id": pa.array([r[0] for r in rows], pa.int64()),
                        "ts": pa.array(
                            [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                        ),
                        "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    }
                )
            )

        empty = evs([])
        one = evs([(1, 100, 7)])
        assert range_join_by_key(empty, one, key="user_id").count() == 0
        assert range_join_by_key(one, empty, key="user_id").count() == 0
        assert range_join_by_key(empty, empty, key="user_id").count() == 0


class TestSkyline:
    def test_matches_brute_force(self):
        from textalyzer_ray.pipelines.analytics import skyline

        rng = np.random.RandomState(1)
        n = 400
        mx = rng.randint(0, 50, n).astype(np.int64)
        mn = rng.randint(0, 50, n).astype(np.int64)
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n)),
                "tok": pa.array(mx),
                "ch": pa.array(mn),
            }
        )
        got = (
            skyline(rd.from_arrow(t).repartition(7), "tok", "ch")
            .sort("doc_id")
            .take_all()
        )
        keep = [
            i
            for i in range(n)
            if not any(
                mx[j] >= mx[i]
                and mn[j] <= mn[i]
                and (mx[j] > mx[i] or mn[j] < mn[i])
                for j in range(n)
            )
        ]
        assert [r["doc_id"] for r in got] == keep

    def test_duplicate_points_all_kept(self):
        from textalyzer_ray.pipelines.analytics import skyline

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "tok": pa.array([10, 10, 5, 10], pa.int64()),
                "ch": pa.array([3, 3, 1, 9], pa.int64()),
            }
        )
        got = skyline(rd.from_arrow(t), "tok", "ch").sort("doc_id").take_all()
        # (10,3) twins both survive; (5,1) survives (lower ch);
        # (10,9) dominated by (10,3)
        assert [r["doc_id"] for r in got] == [1, 2, 3]


class TestGroupingSets:
    def test_matches_duckdb_grouping_sets(self):
        import duckdb

        from textalyzer_ray.pipelines.analytics import grouping_sets_rollup

        t = pa.table(
            {
                "lang": ["en", "en", "de", "de", "de", "fr"],
                "source": ["a", "b", "a", "a", "b", "b"],
                "n_chars": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            }
        )
        rows = (
            grouping_sets_rollup(rd.from_arrow(t).repartition(4))
            .sort(["gid", "lang", "source"])
            .take_all()
        )
        con = duckdb.connect()
        con.register("d", t)
        want = con.execute(
            "SELECT CAST(GROUPING(lang, source) AS BIGINT) gid, "
            "coalesce(lang,'') lang, coalesce(source,'') source, "
            "CAST(count(*) AS BIGINT) n_docs, "
            "CAST(sum(n_chars) AS BIGINT) sum_n_chars FROM d "
            "GROUP BY GROUPING SETS ((lang, source),(lang),(source),()) "
            "ORDER BY gid, lang, source"
        ).fetchall()
        got = [
            (r["gid"], r["lang"], r["source"], r["n_docs"], r["sum_n_chars"])
            for r in rows
        ]
        assert got == want


class TestSkylineProperty:
    def test_fuzz_matches_brute_force(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from textalyzer_ray.pipelines.analytics import skyline

        @settings(max_examples=40, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=8),
                    st.integers(min_value=0, max_value=8),
                ),
                min_size=1,
                max_size=30,
            )
        )
        def check(points):
            mx = [p[0] for p in points]
            mn = [p[1] for p in points]
            t = pa.table(
                {
                    "doc_id": pa.array(range(len(points)), pa.int64()),
                    "tok": pa.array(mx, pa.int64()),
                    "ch": pa.array(mn, pa.int64()),
                }
            )
            got = [
                r["doc_id"]
                for r in skyline(rd.from_arrow(t).repartition(3), "tok", "ch")
                .sort("doc_id")
                .take_all()
            ]
            want = [
                i
                for i in range(len(points))
                if not any(
                    mx[j] >= mx[i]
                    and mn[j] <= mn[i]
                    and (mx[j] > mx[i] or mn[j] < mn[i])
                    for j in range(len(points))
                )
            ]
            assert got == want, points

        check()


class TestIntervalCounts:
    def test_matches_direct_filter(self):
        import datetime as dt

        from textalyzer_ray.pipelines.analytics import interval_counts

        base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        rows = []
        for i in range(500):
            rows.append(
                (
                    base + dt.timedelta(minutes=17 * i),
                    ["click", "view", "error"][i % 3],
                )
            )
        t = pa.table(
            {
                "ts": pa.array(
                    [r[0].replace(tzinfo=None) for r in rows],
                    pa.timestamp("us"),
                ),
                "event_type": [r[1] for r in rows],
            }
        )
        h0 = int(base.timestamp()) // 3600
        intervals = [(h0 + 2, h0 + 8), (h0 + 10, h0 + 11), (h0 + 0, h0 + 1)]
        got = (
            interval_counts(rd.from_arrow(t).repartition(5), intervals)
            .sort(["interval_id", "event_type"])
            .take_all()
        )
        want = []
        for k, (a, b) in enumerate(intervals):
            counts = {}
            for ts, ty in rows:
                h = int(ts.timestamp()) // 3600
                if a <= h < b:
                    counts[ty] = counts.get(ty, 0) + 1
            for ty in sorted(counts):
                want.append((k, ty, counts[ty]))
        assert [
            (r["interval_id"], r["event_type"], r["n"]) for r in got
        ] == want

    def test_half_open_boundaries(self):
        import datetime as dt

        from textalyzer_ray.pipelines.analytics import interval_counts

        base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        h0 = int(base.timestamp()) // 3600
        # one event exactly at the start hour, one at the end hour
        t = pa.table(
            {
                "ts": pa.array(
                    [
                        base.replace(tzinfo=None),
                        (base + dt.timedelta(hours=2)).replace(tzinfo=None),
                    ],
                    pa.timestamp("us"),
                ),
                "event_type": ["click", "click"],
            }
        )
        got = interval_counts(
            rd.from_arrow(t), [(h0, h0 + 2)]
        ).take_all()
        assert [(r["interval_id"], r["n"]) for r in got] == [(0, 1)]


class TestLexicalProfile:
    def _docs(self, texts):
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def test_hand_computed(self):
        from textalyzer_ray.pipelines.analytics import lexical_profile

        rows = {
            r["doc_id"]: r
            for r in lexical_profile(
                self._docs(
                    [
                        "the cat and the dog and the bird",  # the:3 and:2 cat/dog/bird:1
                        "",  # token-free
                        "word word word",  # one type, no hapax
                        "all distinct tokens here",  # pure hapax
                    ]
                )
            ).take_all()
        }
        assert (rows[0]["n_tokens"], rows[0]["n_types"], rows[0]["n_hapax"]) == (8, 5, 3)
        assert rows[0]["ttr"] == 5 / 8
        assert (rows[1]["n_tokens"], rows[1]["n_types"], rows[1]["n_hapax"], rows[1]["ttr"]) == (0, 0, 0, 0.0)
        assert (rows[2]["n_tokens"], rows[2]["n_types"], rows[2]["n_hapax"]) == (3, 1, 0)
        assert rows[2]["ttr"] == 1 / 3
        assert (rows[3]["n_tokens"], rows[3]["n_types"], rows[3]["n_hapax"], rows[3]["ttr"]) == (4, 4, 4, 1.0)

    def test_tokenizer_semantics_match_core(self):
        """Non-letter split + lowercase: digits/punct break tokens,
        case folds (core.textmetrics.tokenize is the spec)."""
        from textalyzer_ray.pipelines.analytics import lexical_profile

        txt = "Red RED red2red re-d"
        rows = lexical_profile(self._docs([txt])).take_all()
        toks = tokenize(txt)
        assert rows[0]["n_tokens"] == len(toks)
        assert rows[0]["n_types"] == len(set(toks))
        counts = frequency_map(txt)
        assert rows[0]["n_hapax"] == sum(1 for v in counts.values() if v == 1)


class TestDecayedCounts:
    def _events(self, rows):
        """rows = [(user_id, ts_us), ...]"""
        import pyarrow as pa

        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [r[1] for r in rows], pa.timestamp("us")
                    ),
                }
            )
        )

    def test_hand_computed(self):
        from textalyzer_ray.pipelines.analytics import decayed_counts

        hl = 1_000_000  # 1 s halflife for hand math
        base = 10_000_000
        ev = self._events(
            [
                (1, base),          # age 0   -> k=0 -> 2^5
                (1, base - 1_000_000),   # k=1 -> 2^4
                (1, base - 1_500_000),   # k=1 -> 2^4
                (2, base - 5_000_000),   # k=5 -> 2^0
                (2, base - 6_000_000),   # k=6 > K -> dropped
            ]
        )
        got = {
            r["user_id"]: (r["n_events"], r["score_units"], r["score"])
            for r in decayed_counts(
                ev, halflife_s=1, max_halflives=5
            ).take_all()
        }
        assert got[1] == (3, 32 + 16 + 16, (32 + 16 + 16) / 32)
        assert got[2] == (1, 1, 1 / 32)

    def test_all_out_of_horizon_key_omitted(self):
        from textalyzer_ray.pipelines.analytics import decayed_counts

        base = 10_000_000
        ev = self._events([(1, base), (2, base - 50_000_000)])
        got = decayed_counts(ev, halflife_s=1, max_halflives=5).take_all()
        assert [(r["user_id"], r["score_units"]) for r in got] == [(1, 32)]

    def test_exactness_guard(self):
        import pytest as _pytest

        from textalyzer_ray.pipelines.analytics import decayed_counts

        base = 10_000_000
        # 2^53 units would need max_halflives=53 and one k=0 event
        ev = self._events([(1, base), (1, base)])
        with _pytest.raises(Exception, match="2\\^53"):
            decayed_counts(ev, halflife_s=1, max_halflives=53).take_all()

    def test_dyadic_sum_is_exact_double(self):
        """score equals the Fraction-exact value, not merely close."""
        from fractions import Fraction

        from textalyzer_ray.pipelines.analytics import decayed_counts

        base = 99_000_000
        rows = [(7, base - i * 333_333) for i in range(40)]
        got = decayed_counts(
            self._events(rows), halflife_s=1, max_halflives=20
        ).take_all()[0]
        K = 20
        exact = sum(
            Fraction(1, 2 ** min((base - ts) // 1_000_000, K + 1))
            for _, ts in rows
            if (base - ts) // 1_000_000 <= K
        )
        assert Fraction(got["score"]) == exact
        assert got["score_units"] == int(exact * 2**K)


class TestTrendingTerms:
    def test_hand_computed(self):
        import pyarrow as pa

        from textalyzer_ray.pipelines.frequency import trending_terms

        us = 1_000_000
        ds = rd.from_arrow(
            pa.table(
                {
                    "warc_ts": pa.array(
                        # two windows: [0, 60) and [60, 120) seconds
                        [5 * us, 30 * us, 59 * us, 61 * us, 119 * us],
                        pa.timestamp("us"),
                    ),
                    "text": pa.array(
                        [
                            "apple apple banana",
                            "apple cherry",
                            "banana",
                            "cherry cherry",
                            "apple",
                        ]
                    ),
                }
            )
        )
        got = [
            (r["window_start"], r["word"], r["count"], r["rank"])
            for r in trending_terms(ds, window_s=60, k=2).take_all()
        ]
        assert got == [
            (0, "apple", 3, 1),
            (0, "banana", 2, 2),
            (60, "cherry", 2, 1),
            (60, "apple", 1, 2),
        ]

    def test_tie_breaks_word_asc(self):
        import pyarrow as pa

        from textalyzer_ray.pipelines.frequency import trending_terms

        ds = rd.from_arrow(
            pa.table(
                {
                    "warc_ts": pa.array([0], pa.timestamp("us")),
                    "text": pa.array(["zebra apple zebra apple"]),
                }
            )
        )
        got = [
            (r["word"], r["rank"])
            for r in trending_terms(ds, window_s=60, k=2).take_all()
        ]
        assert got == [("apple", 1), ("zebra", 2)]


class TestSentenceStats:
    def test_boundary_rule_edges(self, ray_session):
        """'Hi! How are you? Fine.' -> pieces ['Hi','How are you','Fine.']
        (end-of-text '.' stays in the last piece); '!! x' -> a leading
        EMPTY piece then 'x'; 'no terminators' -> one piece."""
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.analytics import sentence_stats

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    ["Hi! How are you? Fine.", "!! x", "no terminators"]
                ),
            }
        )
        out = sentence_stats(rd.from_arrow(t).repartition(2)).take_all()
        got = {r["doc_id"]: r for r in out}
        assert got[0]["n_sentences"] == 3
        assert got[0]["max_sent_bytes"] == len("How are you")
        assert got[0]["sum_sent_bytes"] == len("Hi") + len("How are you") + len("Fine.")
        assert got[1]["n_sentences"] == 2
        assert got[1]["max_sent_bytes"] == 1 and got[1]["sum_sent_bytes"] == 1
        assert got[2] == {
            "doc_id": 2,
            "n_sentences": 1,
            "max_sent_bytes": len("no terminators"),
            "sum_sent_bytes": len("no terminators"),
        }

    def test_multibyte_lengths_are_bytes(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.analytics import sentence_stats

        t = pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "text": pa.array(["héé. ok"]),
            }
        )
        out = sentence_stats(rd.from_arrow(t)).take_all()
        assert out == [
            {
                "doc_id": 7,
                "n_sentences": 2,
                "max_sent_bytes": len("héé".encode()),
                "sum_sent_bytes": len("héé".encode()) + 2,
            }
        ]
