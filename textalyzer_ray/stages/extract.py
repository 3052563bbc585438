"""HTML main-content extraction stage (actor pool).

The reference's ingest validity rules (NUL -> binary, invalid UTF-8 ->
drop; textalyzer/src/file_utils.rs:131-150) become explicit ``ok`` /
``drop_reason`` columns instead of silent drops, so the pipeline can both
filter and COUNT what it dropped (SURVEY.md M6).

This is a callable class -> ``map_batches(HtmlExtractor, concurrency=N)``
runs it as an actor pool: any parser warm-up happens once per actor, and
HTML parsing (inherently per-document Python) is parallelized across the
pool. Batches stay Arrow in/out.
"""

from __future__ import annotations

import pyarrow as pa

from textalyzer_ray.core.extract import extract_main_text


class HtmlExtractor:
    """html:binary -> text:string (+ ok, drop_reason). Deterministic:
    output is byte-identical to core.extract.extract_main_text per url."""

    def __init__(self, html_col: str = "html", out_col: str = "text"):
        self.html_col = html_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch[self.html_col].to_pylist()
        texts: list[str] = []
        oks: list[bool] = []
        reasons: list[str] = []
        for h in htmls:
            r = extract_main_text(h if h is not None else b"")
            texts.append(r.text)
            oks.append(r.ok)
            reasons.append(r.drop_reason)
        out = batch
        if self.out_col in out.column_names:
            out = out.drop_columns([self.out_col])
        out = out.append_column(self.out_col, pa.array(texts, pa.string()))
        out = out.append_column("ok", pa.array(oks, pa.bool_()))
        out = out.append_column("drop_reason", pa.array(reasons, pa.string()))
        return out


def keep_valid(batch: pa.Table) -> pa.Table:
    """Filter to ok rows, dropping the bookkeeping columns."""
    import pyarrow.compute as pc

    return batch.filter(pc.field("ok")).drop_columns(["ok", "drop_reason"])


class PdfExtractor:
    """pdf:binary -> text:string (+ ok, drop_reason) — the PDF/layout
    modality of the extraction tier (core/pdftext.py: stdlib-only
    FlateDecode content-stream scanner). Same actor-pool contract and
    bookkeeping columns as HtmlExtractor."""

    def __init__(self, data_col: str = "pdf", out_col: str = "text"):
        self.data_col = data_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from textalyzer_ray.core.pdftext import extract_pdf_text

        texts: list[str] = []
        oks: list[bool] = []
        reasons: list[str] = []
        for raw in batch[self.data_col].to_pylist():
            raw = raw or b""
            if not raw.startswith(b"%PDF-"):
                texts.append("")
                oks.append(False)
                reasons.append("not_pdf")
                continue
            text = extract_pdf_text(raw)
            texts.append(text)
            oks.append(bool(text))
            reasons.append("" if text else "empty")
        out = batch
        if self.out_col in out.column_names:
            out = out.drop_columns([self.out_col])
        out = out.append_column(self.out_col, pa.array(texts, pa.string()))
        out = out.append_column("ok", pa.array(oks, pa.bool_()))
        out = out.append_column("drop_reason", pa.array(reasons, pa.string()))
        return out


class MetaExtractor:
    """html:binary -> head-metadata columns (title, canonical,
    description, robots, og_site_name, og_title — absent tags are
    null). Actor-pool stage like HtmlExtractor; parses only the head
    slice per document (core.extract.extract_head_meta)."""

    _FIELDS = (
        "title",
        "canonical",
        "description",
        "robots",
        "og_site_name",
        "og_title",
    )

    def __init__(self, html_col: str = "html"):
        self.html_col = html_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from textalyzer_ray.core.extract import extract_head_meta

        cols: dict[str, list] = {f: [] for f in self._FIELDS}
        for h in batch[self.html_col].to_pylist():
            m = extract_head_meta(h if h is not None else b"")
            for f in self._FIELDS:
                cols[f].append(m[f])
        out = batch
        for f in self._FIELDS:
            if f in out.column_names:
                out = out.drop_columns([f])
            out = out.append_column(f, pa.array(cols[f], pa.string()))
        return out
