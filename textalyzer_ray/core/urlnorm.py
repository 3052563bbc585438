"""Canonical URL normalization for web-corpus dedup keys.

Conservative, deterministic subset of RFC 3986 normalization plus the
tracking-param strip every crawl pipeline applies (public practice:
scheme/host case, default ports, fragments, utm_*):

- scheme and host lowercased; trailing dot on host removed
- default ports stripped (http:80, https:443)
- fragment removed
- query: utm_* / fbclid / gclid params dropped, remainder sorted by
  (key, value) for order-insensitive equality; empty query removed
- empty path becomes '/'
- percent-encodings are left untouched (decoding changes semantics)

``canonical_url`` is pure stdlib (urllib.parse) and returns the input
unchanged when it does not parse as an absolute http(s) URL — never
raises on crawl garbage.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_KEYS = {"fbclid", "gclid", "msclkid", "mc_eid"}


def canonical_url(url: str) -> str:
    # The whole body sits inside the try: urlsplit() itself rarely raises,
    # but the lazy .hostname/.port property accessors raise ValueError on
    # malformed or out-of-range ports ('http://h:abc/', 'http://h:99999/').
    # One bad URL must not crash a whole add_canonical_url batch.
    try:
        parts = urlsplit(url)
        scheme = parts.scheme.lower()
        if scheme not in ("http", "https") or not parts.hostname:
            return url
        host = parts.hostname.lower().rstrip(".")
        netloc = host
        if parts.port is not None and str(parts.port) != _DEFAULT_PORTS.get(scheme):
            netloc = f"{host}:{parts.port}"
        if parts.username:
            cred = parts.username + (f":{parts.password}" if parts.password else "")
            netloc = f"{cred}@{netloc}"
        path = parts.path or "/"
        pairs = [
            (k, v)
            for k, v in parse_qsl(parts.query, keep_blank_values=True)
            if not k.lower().startswith(_TRACKING_PREFIXES)
            and k.lower() not in _TRACKING_KEYS
        ]
        query = urlencode(sorted(pairs)) if pairs else ""
        return urlunsplit((scheme, netloc, path, query, ""))
    except ValueError:
        return url
