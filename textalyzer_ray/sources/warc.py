"""WARC (Web ARChive, ISO 28500) ingestion — the container format
Common Crawl ships — as a Ray Data source, plus a writer for
deterministic test shards.

Format (public spec, WARC/1.0 and 1.1): a WARC file is a concatenation
of records; each record is a CRLF-delimited header block
(``WARC/1.0`` version line + ``Name: value`` fields, terminated by an
empty line), a payload of exactly ``Content-Length`` bytes, then two
CRLFs. Response records carry an HTTP response message as payload; the
page body is everything after the HTTP header block's ``\\r\\n\\r\\n``.
Parsing is length-prefix-driven (never a regex scan over payload
bytes), so binary payloads containing ``WARC/1.0`` cannot desync the
reader.

Scale shape: ``read_warc`` maps one task per shard file
(``read_binary_files`` keeps each file one block — WARC shards are the
unit of parallelism exactly as in Common Crawl processing), and each
task emits an Arrow (url, warc_ts, html) batch. Record parsing is a
forward scan over the shard bytes with O(1) allocations per record.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

_CRLF = b"\r\n"
_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

WARC_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
    ]
)


def _warc_date(ts_us: int) -> str:
    """Microseconds-since-epoch -> WARC-Date (ISO 8601, second
    precision, Z suffix — the WARC/1.0 mandated form)."""
    t = _EPOCH + _dt.timedelta(microseconds=ts_us)
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_date(s: str) -> int:
    """WARC-Date -> microseconds since epoch. Accepts the 1.0 form
    (seconds) and the 1.1 form (fractional seconds)."""
    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1]
    if "." in s:
        base, frac = s.split(".", 1)
        us = int(round(float("0." + frac) * 1_000_000))
    else:
        base, us = s, 0
    t = _dt.datetime.strptime(base, "%Y-%m-%dT%H:%M:%S").replace(
        tzinfo=_dt.timezone.utc
    )
    return int((t - _EPOCH).total_seconds()) * 1_000_000 + us


def write_warc_file(path: str, records) -> int:
    """Write a WARC/1.0 file of HTTP response records.

    ``records``: iterable of (url, ts_us, html_bytes). Returns the
    record count. Output begins with a ``warcinfo`` record like real
    crawler output, so readers must skip non-response records."""
    n = 0
    with open(path, "wb") as f:
        info_body = b"software: textalyzer_ray-synthetic/1.0\r\n"
        f.write(
            b"WARC/1.0\r\n"
            b"WARC-Type: warcinfo\r\n"
            b"Content-Type: application/warc-fields\r\n"
            + f"Content-Length: {len(info_body)}\r\n".encode()
            + _CRLF
            + info_body
            + _CRLF
            + _CRLF
        )
        for url, ts_us, html in records:
            if isinstance(html, str):
                html = html.encode("utf-8")
            http = (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                + f"Content-Length: {len(html)}\r\n".encode()
                + _CRLF
                + html
            )
            f.write(
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Target-URI: {url}\r\n".encode()
                + f"WARC-Date: {_warc_date(ts_us)}\r\n".encode()
                + b"Content-Type: application/http; msgtype=response\r\n"
                + f"Content-Length: {len(http)}\r\n".encode()
                + _CRLF
                + http
                + _CRLF
                + _CRLF
            )
            n += 1
    return n


def parse_warc_bytes(data: bytes) -> pa.Table:
    """One WARC shard's bytes -> (url, warc_ts, html) Arrow table of its
    response records. Length-prefix forward scan; malformed trailing
    garbage ends the scan (partial shards from a dead crawler are
    readable up to the damage)."""
    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    pos = 0
    size = len(data)
    while pos < size:
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        header_block = data[pos:head_end]
        lines = header_block.split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            break
        fields: dict[bytes, bytes] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            # spec-correct OWS trim: SP and HTAB only (Python's default
            # strip would also eat \x0c/\x0b that belong to the value)
            fields[k.strip(b" \t").lower()] = v.strip(b" \t")
        clen_raw = fields.get(b"content-length", b"")
        # digits-only: int() would also accept b"-37" (negative clen
        # drives pos BACKWARDS -> infinite loop), b"+5" and b"1_2"
        if not clen_raw.isdigit():
            break
        clen = int(clen_raw)
        body_start = head_end + 4
        body_end = body_start + clen
        if body_end > size:
            break
        if fields.get(b"warc-type") == b"response":
            payload = data[body_start:body_end]
            http_end = payload.find(_CRLF + _CRLF)
            html = payload[http_end + 4 :] if http_end >= 0 else payload
            urls.append(
                fields.get(b"warc-target-uri", b"").decode("utf-8", "replace")
            )
            tss.append(
                _parse_warc_date(
                    fields.get(b"warc-date", b"1970-01-01T00:00:00Z").decode()
                )
            )
            htmls.append(html)
        pos = body_end + 4  # payload, then the record-final CRLF CRLF
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a gzip stream of CONCATENATED MEMBERS (Common Crawl
    compresses each WARC record as its own gzip member so records are
    independently seekable). Fast path: stdlib gzip.decompress, which
    is multi-member-aware and linear-time. Damaged streams (truncated
    member, junk between/after members) fall back to a member-by-member
    salvage loop that keeps everything that decoded — matching
    parse_warc_bytes's tolerate-trailing-damage design."""
    import gzip
    import zlib

    try:
        return gzip.decompress(data)
    except (EOFError, zlib.error, gzip.BadGzipFile):
        pass
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        try:
            out.append(d.decompress(data))
        except zlib.error:
            break  # junk where a member should start: keep what decoded
        data = d.unused_data
        if not d.eof:
            break  # truncated member: keep what decoded
    return b"".join(out)


def read_warc(paths: str | list[str]):
    """Directory or file list of .warc / .warc.gz shards -> Dataset
    (url, warc_ts, html). The file LIST is built on the driver (cheap —
    one string per shard) and each shard's bytes are read and parsed by
    its own task, so shards are the parallelism unit exactly as in
    Common Crawl processing.

    The ".warc.gz" suffix filter (not bare ".gz") keeps metadata like
    logs.json.gz out of the corpus; a dir holding both foo.warc and
    foo.warc.gz reads both — keep one form per directory. Gzip
    decompression is done by _gunzip_members, NOT Arrow's extension
    inference, so damaged streams (trailing junk, truncated members)
    salvage what decoded instead of crashing the task. Reads are plain
    POSIX opens; for an object store, swap the open for an
    fsspec/pyarrow-fs handle in the task."""
    import os

    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _, fs in os.walk(p):
                files.extend(
                    os.path.join(root, f)
                    for f in sorted(fs)
                    if f.endswith(".warc") or f.endswith(".warc.gz")
                )
        else:
            files.append(p)
    files.sort()
    if not files:
        return rd.from_arrow(WARC_SCHEMA.empty_table())

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for p in batch["item"].to_pylist():
            with open(p, "rb") as f:
                data = f.read()
            if data[:2] == b"\x1f\x8b":
                data = _gunzip_members(data)
            tables.append(parse_warc_bytes(data))
        if not tables:
            return WARC_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    return (
        rd.from_items(files, override_num_blocks=len(files))
        .map_batches(parse, batch_format="pyarrow")
    )


def write_warc_shards(ds, out_dir: str, clean: bool = True) -> int:
    """Distributed WARC sink: each BLOCK of a (url, warc_ts, html)
    Dataset becomes one .warc shard written by its own task (the
    re-packaging side of crawl processing: filter/scrub -> rewrite).

    Durability contract:
    - shard names derive from the FULL record content of the block
      (sha1 over every url + warc_ts + html length + html bytes), so
      distinct blocks cannot collide on a path — even two recrawls of
      the same url with same-length but different bytes, or differing
      only in timestamp — and the same logical block always lands on
      the same name;
    - each shard is written to a ``.tmp-`` name and atomically renamed
      (a killed task can never leave a truncated shard at a final
      name — the same contract as state/manifest.py's parquet sink);
    - ``clean=True`` (default) sweeps pre-existing ``shard-*.warc`` and
      leaked ``*.tmp-*`` from ``out_dir`` first, so a rerun with
      different block boundaries cannot leave stale shards that a
      recursive ``read_warc`` would double-count.

    Null tolerance: a null warc_ts writes as epoch 0 and a null url as
    the empty string (both legal per WARC_SCHEMA's nullable fields)
    rather than crashing the task. Returns the total record count via a
    one-row-per-shard manifest."""
    import hashlib
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    if clean:
        for f in os.listdir(out_dir):
            if (f.startswith("shard-") and f.endswith(".warc")) or ".tmp-" in f:
                os.unlink(os.path.join(out_dir, f))
    manifest_schema = pa.schema(
        [pa.field("path", pa.string()), pa.field("n_records", pa.int64())]
    )

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return manifest_schema.empty_table()
        urls = pc.fill_null(t["url"], "").to_pylist()
        tss = pc.fill_null(
            t["warc_ts"].combine_chunks().cast(pa.int64()), 0
        ).to_pylist()
        htmls = [h if h is not None else b"" for h in t["html"].to_pylist()]
        h = hashlib.sha1()
        for u, ts, b in zip(urls, tss, htmls):
            h.update(u.encode())
            h.update(ts.to_bytes(8, "little", signed=True))
            h.update(len(b).to_bytes(8, "little"))
            h.update(b)
        path = os.path.join(out_dir, f"shard-{h.hexdigest()[:16]}.warc")
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        n = write_warc_file(tmp, zip(urls, tss, htmls))
        os.replace(tmp, path)
        return pa.table(
            {"path": [path], "n_records": pa.array([n], pa.int64())}
        )

    rows = ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).take_all()
    return sum(r["n_records"] for r in rows)
