"""BM25 retrieval + events cohort/funnel analytics: brute-force and
DuckDB equivalence, partitioning invariance, float-safety margins."""

import math

import duckdb
import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.analytics import cohort_retention, funnel_analysis
from textalyzer_ray.pipelines.retrieval import bm25_margins, bm25_topk

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF = "/root/testdata/sf0.001"


def brute_bm25(texts, terms, k1=1.2, b=0.75):
    """Reference scorer over python token lists (same tokenizer via
    core.textmetrics), same left-to-right accumulation order."""
    from textalyzer_ray.core.textmetrics import tokenize

    toks = [tokenize(t) for t in texts]
    dl = [len(t) for t in toks]
    n = len(texts)
    avgdl = float(sum(dl)) / float(n)
    df = [sum(1 for t in toks if term in t) for term in terms]
    idf = [math.log(1.0 + (n - d + 0.5) / (d + 0.5)) for d in df]
    scores = []
    for i in range(n):
        s = 0.0
        denom_base = (1.0 - b) + b * float(dl[i]) / avgdl
        for j, term in enumerate(terms):
            tf = float(toks[i].count(term))
            s = s + idf[j] * ((tf * (k1 + 1.0)) / (tf + k1 * denom_base))
        scores.append(s)
    return scores, dl


class TestBm25:
    def test_matches_brute_force_any_partitioning(self):
        texts = [
            "stream join hash stream",
            "sort merge sort sort window",
            "hash hash hash",
            "scan",
            "nothing relevant here at all",
            "stream",
            "window scan window join stream hash sort",
            "",
        ]
        terms = ["stream", "hash", "sort"]
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        got = bm25_topk(
            rd.from_arrow(t).repartition(5), terms, k=4
        ).take_all()
        scores, dl = brute_bm25(texts, terms)
        want = sorted(
            (
                (int(math.floor(s * 1048576.0 + 0.5)), i, dl[i])
                for i, s in enumerate(scores)
                if s > 0.0
            ),
            key=lambda r: (-r[0], r[1]),
        )[:4]
        assert [
            (r["score_q"], r["doc_id"], r["dl"]) for r in got
        ] == want

    def test_zero_match_query_is_empty(self):
        t = pa.table({"doc_id": [0, 1], "text": ["a b", "c d"]})
        got = bm25_topk(rd.from_arrow(t), ["zzz"], k=5).take_all()
        assert got == []

    def test_testdata_margins_beat_cross_engine_error(self):
        """score_q is driver-gate-hashable only while the doubles stay
        far from the floor(x+0.5) boundary and the k-th rank gap beats
        the ~1e-13 cross-engine expression error (kmeans pattern —
        measured at sf0.001: boundary 4.1e-4, gap 3.3e-3)."""
        from textalyzer_ray.sources.tables import read_table

        terms = ["stream", "hash", "join", "window", "scan", "sort"]
        m = bm25_margins(read_table(SF, "documents"), terms, k=25)
        assert m["n_scored"] > 0
        assert m["min_boundary_dist"] > 1e-7
        assert m["kth_gap"] > 1e-7


def synth_events():
    """4 users with engineered funnel/cohort shapes (hour timestamps)."""
    h = 3_600_000_000  # 1h in us
    rows = [
        # user 0: full funnel within windows
        (0, 1 * h, "signup"),
        (0, 2 * h, "view"),
        (0, 3 * h, "click"),
        (0, 4 * h, "purchase"),
        # user 1: view BEFORE signup (must not count), then times out
        (1, 1 * h, "view"),
        (1, 2 * h, "signup"),
        (1, 40 * h, "view"),  # outside 24h window -> stage 1
        # user 2: no signup at all -> stage 0
        (2, 1 * h, "view"),
        (2, 2 * h, "click"),
        # user 3: signup+view same chain, purchase skips click (stage 2)
        (3, 0 * h, "signup"),
        (3, 23 * h, "view"),
        (3, 30 * h, "purchase"),
        # user 3 activity on later days for retention
        (3, 50 * h, "view"),
    ]
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )


class TestFunnel:
    def test_engineered_stages(self):
        got = funnel_analysis(
            rd.from_arrow(synth_events()).repartition(3),
            steps=("signup", "view", "click", "purchase"),
            window_s=86400,
        ).take_all()
        # user0 -> 4, user1 -> 1, user2 -> 0, user3 -> 2
        assert [(r["stage"], r["n_users"]) for r in got] == [
            (0, 1),
            (1, 1),
            (2, 1),
            (4, 1),
        ]

    def test_strictly_after_semantics(self):
        """A step event at EXACTLY the previous step's timestamp does
        not count (strict >), one at prev + window does (<=)."""
        h = 3_600_000_000
        t = pa.table(
            {
                "user_id": pa.array([0, 0, 1, 1], pa.int64()),
                "ts": pa.array([h, h, h, h + 3600_000_000], pa.timestamp("us")),
                "event_type": ["signup", "view", "signup", "view"],
            }
        )
        got = funnel_analysis(
            rd.from_arrow(t), steps=("signup", "view"), window_s=3600
        ).take_all()
        assert [(r["stage"], r["n_users"]) for r in got] == [(1, 1), (2, 1)]

    def test_matches_duckdb_on_testdata(self):
        from textalyzer_ray.sources.tables import read_table

        got = funnel_analysis(read_table(SF, "events")).take_all()
        w = 86400 * 1_000_000
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
        )
        want = con.sql(
            f"""
WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
    WHERE event_type='signup' GROUP BY 1),
s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e
    JOIN s1 USING (user_id) WHERE e.event_type='view'
    AND epoch_us(e.ts) > s1.t AND epoch_us(e.ts) <= s1.t + {w} GROUP BY 1),
s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e
    JOIN s2 USING (user_id) WHERE e.event_type='click'
    AND epoch_us(e.ts) > s2.t AND epoch_us(e.ts) <= s2.t + {w} GROUP BY 1),
s4 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e
    JOIN s3 USING (user_id) WHERE e.event_type='purchase'
    AND epoch_us(e.ts) > s3.t AND epoch_us(e.ts) <= s3.t + {w} GROUP BY 1),
u AS (SELECT DISTINCT user_id FROM events
    WHERE event_type IN ('signup','view','click','purchase')),
st AS (SELECT u.user_id,
    CASE WHEN s4.t IS NOT NULL THEN 4 WHEN s3.t IS NOT NULL THEN 3
         WHEN s2.t IS NOT NULL THEN 2 WHEN s1.t IS NOT NULL THEN 1
         ELSE 0 END AS stage
    FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id))
SELECT stage, count(*) AS n FROM st GROUP BY 1 ORDER BY 1"""
        ).fetchall()
        assert [(r["stage"], r["n_users"]) for r in got] == [
            tuple(r) for r in want
        ]


class TestCohortRetention:
    def test_engineered_cells(self):
        got = cohort_retention(
            rd.from_arrow(synth_events()).repartition(3)
        ).take_all()
        # users 0,1,2 cohort day 0 (events at hours 0-4); user 3 day 0;
        # user 1 active day 1 (40h); user 3 active days 0,1 (23h,30h)
        # and day 2 (50h)
        assert [
            (r["cohort_day"], r["day_offset"], r["n_users"]) for r in got
        ] == [(0, 0, 4), (0, 1, 2), (0, 2, 1)]

    def test_matches_duckdb_on_testdata(self):
        from textalyzer_ray.sources.tables import read_table

        got = cohort_retention(read_table(SF, "events")).take_all()
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
        )
        want = con.sql(
            """
WITH uw AS (SELECT DISTINCT user_id,
        epoch_us(ts) // 86400000000 AS day FROM events),
c AS (SELECT user_id, min(day) AS cohort_day FROM uw GROUP BY 1)
SELECT c.cohort_day, uw.day - c.cohort_day AS day_offset,
       count(*) AS n_users
FROM uw JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2"""
        ).fetchall()
        assert [
            (r["cohort_day"], r["day_offset"], r["n_users"]) for r in got
        ] == [tuple(r) for r in want]


class TestInvertedIndex:
    def test_postings_exact(self):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.retrieval import inverted_index

        t = pa.table(
            {
                "doc_id": pa.array([5, 3, 9], pa.int64()),
                "text": ["b a b a", "a c", ""],
            }
        )
        got = inverted_index(rd.from_arrow(t).repartition(3)).take_all()
        assert got == [
            {"word": "a", "df": 2, "postings": "3,5"},
            {"word": "b", "df": 1, "postings": "5"},
            {"word": "c", "df": 1, "postings": "3"},
        ]

    def test_empty(self):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.retrieval import inverted_index

        t = pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
        assert inverted_index(rd.from_arrow(t)).take_all() == []


class TestPhraseSearch:
    def test_occurrences_exact(self):
        from textalyzer_ray.pipelines.retrieval import phrase_search

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [
                    "the quick brown fox",
                    "a quick brown dog, the quick brown cat",
                    "quick... brown",  # punctuation splits, still adjacent
                    "quick stop brown",  # intervening token: no match
                ],
            }
        )
        got = phrase_search(
            rd.from_arrow(t).repartition(3),
            [["quick", "brown"], ["the", "quick", "brown", "fox"]],
        ).take_all()
        assert [(r["phrase_id"], r["doc_id"], r["pos"]) for r in got] == [
            (0, 1, 2),
            (0, 2, 2),
            (0, 2, 6),
            (0, 3, 1),
            (1, 1, 1),
        ]

    def test_no_cross_doc_match(self):
        # last token of doc 1 + first of doc 2 form the phrase in the
        # flat array; the same-parent guard must reject it
        from textalyzer_ray.pipelines.retrieval import phrase_search

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["ends with alpha", "beta starts"],
            }
        )
        got = phrase_search(rd.from_arrow(t), [["alpha", "beta"]]).take_all()
        assert got == []

    def test_case_and_empty_phrase(self):
        from textalyzer_ray.pipelines.retrieval import phrase_search

        t = pa.table(
            {"doc_id": pa.array([1], pa.int64()), "text": ["Quick BROWN"]}
        )
        got = phrase_search(rd.from_arrow(t), [["quick", "brown"]]).take_all()
        assert [(r["phrase_id"], r["doc_id"], r["pos"]) for r in got] == [
            (0, 1, 1)
        ]
        with pytest.raises(ValueError):
            phrase_search(rd.from_arrow(t), [])
        with pytest.raises(ValueError):
            phrase_search(rd.from_arrow(t), [["a"], []])

    def test_partitioning_invariance_on_testdata(self):
        from textalyzer_ray.sources.tables import read_table
        from textalyzer_ray.pipelines.retrieval import phrase_search

        docs = read_table(SF, "documents", columns=["doc_id", "text"])
        phrases = [["the"], ["of", "the"]]
        a = phrase_search(docs, phrases).take_all()
        b = phrase_search(
            read_table(SF, "documents", columns=["doc_id", "text"]).repartition(7),
            phrases,
        ).take_all()
        assert a == b
        assert len(a) > 0
