"""Deterministic PDF text extraction — pure stdlib (zlib), no poppler.

Covers the extraction-tier "PDF/layout parse" modality (BASELINE.json
north_rule) for the dominant real-world case: Flate-compressed (or
uncompressed) content streams with literal-string text operators. The
format is public (ISO 32000); this is a from-scratch scanner, not a port.

Scope (documented limits):
- object streams are found by scanning ``stream``/``endstream`` pairs —
  no xref table needed (robust to the incremental-update garbage real
  PDFs accumulate);
- filters: none or /FlateDecode. Image/other filters are skipped;
- text: ``BT``..``ET`` blocks; ``(..) Tj``, ``(..) '``, ``(..) "`` and
  ``[..] TJ`` literal strings with the full escape set (\\n \\r \\t \\b
  \\f \\( \\) \\\\ \\ooo, line-continuation); balanced nested parens;
- layout: ``Td``/``TD``/``T*`` and ``'``/``\"`` start a new line; TJ kern
  adjustments are ignored (no inter-word spacing synthesis);
- encoding: bytes are decoded latin-1 (no ToUnicode CMap — hex strings
  ``<..>`` are therefore skipped, they are almost always CID-keyed).
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n", re.DOTALL)
_ESCAPES = {
    ord("n"): "\n",
    ord("r"): "\r",
    ord("t"): "\t",
    ord("b"): "\b",
    ord("f"): "\f",
    ord("("): "(",
    ord(")"): ")",
    ord("\\"): "\\",
}


def _iter_streams(data: bytes):
    """Yield raw (dict_prefix, stream_bytes) pairs by scanning."""
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if not m:
            return
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            return
        # dict is whatever sits between the previous 'obj' (or stream
        # end) and the 'stream' keyword — enough to sniff the filter
        dict_start = max(data.rfind(b"<<", 0, m.start()), 0)
        raw = data[start:end]
        # exactly ONE EOL before 'endstream' is markup, not data —
        # rstrip would eat trailing 0x0a/0x0d bytes of a zlib stream
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
        yield data[dict_start : m.start()], raw
        pos = end + len(b"endstream")


def _decode_stream(dict_prefix: bytes, raw: bytes) -> bytes | None:
    if b"/FlateDecode" in dict_prefix:
        try:
            # decompressobj tolerates trailing junk (a stray EOL the
            # stream scanner could not attribute) via unused_data
            return zlib.decompressobj().decompress(raw)
        except zlib.error:
            return None
    if b"/Filter" in dict_prefix:
        return None  # image/other encodings — not text
    return raw


def _parse_literal_string(buf: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal starting at ``buf[i] == '('``; returns
    (text, index_past_close). Handles nesting and the escape set."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(buf)
    while i < n and depth > 0:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i
                while j < n and j - i < 3 and 0x30 <= buf[j] <= 0x37:
                    j += 1
                out.append(chr(int(buf[i:j], 8) & 0xFF))
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth > 0:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


_TOKEN_RE = re.compile(
    rb"\(|\)|\[|\]|<<|>>|<[0-9A-Fa-f\s]*>|/[^\s/\[\]()<>]*|[^\s\[\]()<>/]+"
)


def extract_text_from_content(content: bytes) -> str:
    """Text from one decoded content stream: BT..ET blocks, literal
    strings shown by Tj / ' / " / TJ; Td/TD/T*/' /" break lines."""
    lines: list[str] = []
    cur: list[str] = []
    in_text = False
    i = 0
    n = len(content)
    pending: list[str] = []  # strings seen since the last operator

    def flush_line():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    while i < n:
        c = content[i]
        if c in b" \t\r\n\x00":
            i += 1
            continue
        if c == 0x28:  # literal string
            s, i = _parse_literal_string(content, i)
            pending.append(s)
            continue
        m = _TOKEN_RE.match(content, i)
        if not m:
            i += 1
            continue
        tok = m.group(0)
        i = m.end()
        if tok == b"BT":
            in_text = True
            pending.clear()
        elif tok == b"ET":
            flush_line()
            in_text = False
            pending.clear()
        elif not in_text:
            pending.clear()
        elif tok in (b"Tj", b"TJ"):
            cur.extend(pending)
            pending.clear()
        elif tok in (b"'", b'"'):
            flush_line()
            cur.extend(pending)
            pending.clear()
        elif tok in (b"Td", b"TD", b"T*"):
            flush_line()
            pending.clear()
        elif tok in (b"[", b"]"):
            pass  # TJ array delimiters; strings inside stay pending
        elif tok.startswith(b"<") and not tok.startswith(b"<<"):
            pass  # hex string (CID-keyed) — skipped, see module docs
        else:
            # any other operator consumes its operands
            if tok not in (b"<<", b">>") and not _is_number(tok) and not tok.startswith(b"/"):
                pending.clear()
    flush_line()
    return "\n".join(l for l in (ln.strip() for ln in lines) if l)


def _is_number(tok: bytes) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


def extract_pdf_text(data: bytes) -> str:
    """All text from a PDF's content streams, in stream order; ''
    for non-PDF input or PDFs with no extractable literal text."""
    if not data.startswith(b"%PDF-"):
        return ""
    parts: list[str] = []
    for dict_prefix, raw in _iter_streams(data):
        decoded = _decode_stream(dict_prefix, raw)
        if decoded is None or b"BT" not in decoded:
            continue
        text = extract_text_from_content(decoded)
        if text:
            parts.append(text)
    return "\n".join(parts)
