"""Canonical URL normalization cases."""

from textalyzer_ray.core.urlnorm import canonical_url


CASES = [
    # scheme/host case + default port
    ("HTTP://Example.COM:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    # fragment + empty path
    ("http://example.com#frag", "http://example.com/"),
    ("http://example.com/page#sec-2", "http://example.com/page"),
    # tracking params dropped, others sorted
    ("http://e.com/p?utm_source=x&b=2&a=1&fbclid=z", "http://e.com/p?a=1&b=2"),
    ("http://e.com/p?b=2&a=1", "http://e.com/p?a=1&b=2"),
    ("http://e.com/p?a=", "http://e.com/p?a="),
    # trailing host dot; credentials kept
    ("http://example.com./x", "http://example.com/x"),
    ("http://user:pw@example.com/x", "http://user:pw@example.com/x"),
    # path case and percent-escapes untouched
    ("http://e.com/Path%2Fkeep", "http://e.com/Path%2Fkeep"),
    # non-http and garbage pass through unchanged
    ("ftp://example.com/x", "ftp://example.com/x"),
    ("not a url", "not a url"),
    ("", ""),
    # malformed / out-of-range ports must not raise (r3 ADVICE fix:
    # urlsplit succeeds but .hostname/.port access raises ValueError)
    ("http://host:abc/x", "http://host:abc/x"),
    ("http://host:99999/x", "http://host:99999/x"),
    ("http://host:-1/x", "http://host:-1/x"),
]


def test_canonical_url_cases():
    for raw, want in CASES:
        assert canonical_url(raw) == want, raw


def test_idempotent():
    for raw, want in CASES:
        assert canonical_url(want) == want, want
