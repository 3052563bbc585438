"""Robots-rules frontier filtering: longest-prefix-match semantics
(RFC 9309: longest prefix wins, allow beats disallow on length ties),
checked against hand-derived verdicts and a brute-force re-derivation."""

import pyarrow as pa
import pytest

import ray.data as rd

from textalyzer_ray.pipelines.robots import (
    frontier_robots_filter,
    robots_match,
    robots_rules_for_sites,
)

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def _urls(urls):
    return rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))


def _verdicts(urls, rules=None):
    rules = rules if rules is not None else robots_rules_for_sites(50)
    return {
        r["url"]: (r["allowed"], r["rule_prefix"], r["host"])
        for r in robots_match(_urls(urls), rules).take_all()
    }


class TestRobotsMatch:
    def test_longest_prefix_wins(self):
        got = _verdicts(
            [
                "https://site0.example/page/7",  # /page/ (h=0: 0%3==0 -> 0)
                "https://site0.example/page/19",  # /page/1 overrides -> 1
                "https://site0.example/page/12",  # /page/12 (0%2==0) -> 1
                "https://site1.example/page/19",  # h=1: /page/1 -> 0
                "https://site1.example/page/7",  # /page/ (1%3!=0) -> 1
                "https://site1.example/page/123",  # /page/12 (1%2!=0) -> 0
            ]
        )
        assert got["https://site0.example/page/7"][:2] == (0, "/page/")
        assert got["https://site0.example/page/19"][:2] == (1, "/page/1")
        assert got["https://site0.example/page/12"][:2] == (1, "/page/12")
        assert got["https://site1.example/page/19"][:2] == (0, "/page/1")
        assert got["https://site1.example/page/7"][:2] == (1, "/page/")
        assert got["https://site1.example/page/123"][:2] == (0, "/page/12")

    def test_root_and_default(self):
        got = _verdicts(
            [
                "https://site3.example/",  # explicit "/" rule
                "https://site3.example",  # no path -> treated as "/"
                "https://nowhere.example/x",  # host with no rules
            ]
        )
        assert got["https://site3.example/"][:2] == (1, "/")
        assert got["https://site3.example"][:2] == (1, "/")
        # default allow with empty winning prefix
        assert got["https://nowhere.example/x"] == (1, "", "nowhere.example")

    def test_tie_allow_beats_disallow(self):
        # two same-length prefixes, conflicting verdicts: allow wins
        rules = pa.table(
            {
                "host": pa.array(["h.example"] * 2),
                "prefix": pa.array(["/a/", "/a/"]),
                "allow": pa.array([0, 1], pa.int64()),
            }
        )
        got = _verdicts(["https://h.example/a/x"], rules)
        assert got["https://h.example/a/x"][:2] == (1, "/a/")

    def test_brute_force_parity(self):
        """Every synthetic cross-link URL against a pure-Python
        longest-prefix re-derivation of the same rule set."""
        rules_t = robots_rules_for_sites(50)
        rules = {}
        for h, p, a in zip(
            rules_t["host"].to_pylist(),
            rules_t["prefix"].to_pylist(),
            rules_t["allow"].to_pylist(),
        ):
            rules.setdefault(h, []).append((p, a))
        urls = [
            f"https://site{t % 50}.example/page/{t}"
            for t in range(0, 10_000, 37)
        ]
        got = _verdicts(urls)
        for u in urls:
            host = u.split("//")[1].split("/")[0]
            path = "/" + u.split(".example/")[1]
            matches = [
                (len(p), a, p)
                for p, a in rules[host]
                if path.startswith(p)
            ]
            # longest prefix; allow beats disallow on ties
            best = sorted(matches, key=lambda m: (-m[0], -m[1], m[2]))[0]
            assert got[u][:2] == (best[1], best[2]), u

    def test_oversized_rules_refused(self):
        rules = robots_rules_for_sites(3)
        with pytest.raises(ValueError, match="broadcast_max_rules"):
            robots_match(_urls(["https://x/"]), rules, broadcast_max_rules=2)


class TestFrontierFilter:
    def test_distinct_then_match(self):
        urls = [
            "https://site0.example/page/7",
            "https://site0.example/page/19",
            "https://site1.example/page/7",
        ]
        out = frontier_robots_filter(
            _urls(urls * 5), robots_rules_for_sites(50)
        ).take_all()
        assert len(out) == 3  # duplicates collapsed
        byurl = {r["url"]: r["allowed"] for r in out}
        assert byurl == {
            "https://site0.example/page/7": 0,
            "https://site0.example/page/19": 1,
            "https://site1.example/page/7": 1,
        }

    def test_small_path_equals_distributed(self):
        from textalyzer_ray.pipelines.robots import crawl_schedule

        urls = [
            f"https://site{h}.example/page/{i}"
            for h in range(6)
            for i in range(9)
        ] + ["https://nosite.other/x"]
        rules = robots_rules_for_sites(50)

        def key(rows):
            return sorted(tuple(sorted(r.items())) for r in rows)

        small = frontier_robots_filter(_urls(urls * 3), rules).take_all()
        dist = frontier_robots_filter(
            _urls(urls * 3), rules, small_threshold=0
        ).take_all()
        assert key(small) == key(dist) and len(small) == len(urls)

        s_sched = crawl_schedule(_urls(urls * 3), rules).take_all()
        d_sched = crawl_schedule(
            _urls(urls * 3), rules, small_threshold=0
        ).take_all()
        assert key(s_sched) == key(d_sched)
        # small path preserves the sorted-by-url output contract
        assert [r["url"] for r in s_sched] == sorted(r["url"] for r in s_sched)
