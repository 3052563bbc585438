"""Deterministic synthetic Common-Crawl-style web pages (FIXTURES.md F1).

Builds the input table from BASELINE.json input_hint —
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` — without any external data: the page body is either
caller-provided text (e.g. the driver testdata ``documents`` table) or
drawn from a seeded word pool.

The ``text`` column is the EXPECTED main-content extraction (the oracle
output); the conformance invariant is ``extract_main_text(html).text ==
text`` byte-for-byte per url. Pages wrap the content in realistic
boilerplate: head scripts/styles, a high-link-density <nav>, sidebar and
footer — which the Arc90 scorer must reject.

Everything is pure and seeded; the same inputs always produce the same
bytes, which is what makes per-partition resume verifiable by content
hash.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

_WORD_POOL = (
    "the data stream batch arrow block shuffle actor pool ray cluster "
    "partition merge sort filter map reduce token word line page crawl "
    "web text extract content main nav footer link density score index "
    "hash group key salt skew spill memory object store lineage resume"
).split()

_EPOCH_US = 1_600_000_000 * 1_000_000  # fixed epoch, no wall-clock use

_HEAD = (
    "<head><title>{title}</title>"
    "<script>var t=performance.now();console.log('boot',t);</script>"
    "<style>body{{margin:0;font:16px sans-serif}}nav a{{color:#06c}}</style>"
    "</head>"
)

_NAV = (
    "<nav><ul>"
    + "".join(f'<li><a href="/cat/{i}">Category {i} links here</a></li>' for i in range(8))
    + "</ul></nav>"
)

_SIDEBAR = (
    '<aside><h3>Related</h3><ul>'
    + "".join(f'<li><a href="/rel/{i}">Related article number {i}</a></li>' for i in range(6))
    + "</ul></aside>"
)

_FOOTER = (
    '<footer><a href="/about">About us</a> <a href="/terms">Terms of service</a>'
    " <a href=\"/privacy\">Privacy policy</a> © example</footer>"
)


def paragraphs_for(text: str, words_per_para: int | None = 40) -> list[str]:
    """Deterministically chunk page text into paragraphs on single-space
    word boundaries. ``"\\n".join(paragraphs)`` reconstructs... a newline-
    normalized text; callers that need byte-identity pass text without
    newlines and get paragraphs whose join IS the expected extraction."""
    if "\n" in text:
        # pre-formatted multi-line content: one paragraph per line
        return [line for line in text.split("\n")]
    if words_per_para is None:
        return [text]
    words = text.split(" ")
    if len(words) <= words_per_para:
        return [text]
    return [
        " ".join(words[i : i + words_per_para])
        for i in range(0, len(words), words_per_para)
    ]


def cross_links_for(doc_id: int) -> list[tuple[str, str]]:
    """Deterministic cross-site outlinks for a page: pure doc_id
    arithmetic (no corpus-size dependence, no RNG), so a DuckDB oracle
    can re-derive every link — targets t_j = (doc_id*31 + 7 + 101*j)
    mod 10000, hosted on site{t_j mod 50}.example. Dangling targets
    (pages that do not exist in the corpus) are intentional: real link
    graphs have them."""
    out = []
    for j in range(3):
        t = (int(doc_id) * 31 + 7 + 101 * j) % 10_000
        out.append((f"https://site{t % 50}.example/page/{t}", f"Linked page {t}"))
    return out


def render_page(
    text: str,
    title: str = "A page",
    words_per_para: int | None = 40,
    extra_links: list[tuple[str, str]] | None = None,
    head_extra: str = "",
) -> bytes:
    """text -> full HTML page whose main-content extraction equals
    ``"\\n".join(paragraphs_for(text, words_per_para))`` byte-for-byte.

    ``extra_links`` (href, anchor) pairs are injected into the link-
    dense <aside> — boilerplate the Arc90 scorer rejects — so they are
    visible to outlink extraction but can never change the extracted
    main content. ``head_extra`` raw tags (pre-escaped by the caller)
    are injected before ``</head>`` for metadata-extraction corpora;
    head content never reaches the extracted text either way."""
    paras = "".join(
        f"<p>{_html.escape(p, quote=False)}</p>"
        for p in paragraphs_for(text, words_per_para)
        if p
    )
    sidebar = _SIDEBAR
    if extra_links:
        injected = "".join(
            f'<li><a href="{href}">{_html.escape(anchor, quote=False)}</a></li>'
            for href, anchor in extra_links
        )
        sidebar = sidebar.replace("</ul></aside>", injected + "</ul></aside>")
    head = _HEAD.format(title=_html.escape(title, quote=False))
    if head_extra:
        head = head.replace("</head>", head_extra + "</head>")
    doc = (
        "<!DOCTYPE html><html>"
        + head
        + "<body>"
        + _NAV
        + f'<div id="content"><article>{paras}</article></div>'
        + sidebar
        + _FOOTER
        + "</body></html>"
    )
    return doc.encode("utf-8")


def expected_extraction(text: str, words_per_para: int | None = 40) -> str:
    """The oracle extraction for ``render_page(text, words_per_para=...)``."""
    return "\n".join(p for p in paragraphs_for(text, words_per_para) if p)


def synth_corpus(
    n_rows: int,
    seed: int = 42,
    n_domains: int = 50,
    hot_domain_share: float = 0.3,
    invalid_every: int = 0,
) -> pa.Table:
    """Seeded synthetic page table (schema per BASELINE.json input_hint).

    - a few hot domains are overrepresented (skew testing);
    - ``invalid_every > 0`` plants NUL-byte / invalid-UTF-8 bodies every
      that-many rows (must be counted-and-dropped downstream,
      file_utils.rs:134-144 semantics); their ``text`` is "".
    """
    rng = np.random.RandomState(seed)
    langs = ["en", "de", "es", "fr", "zh"]
    urls, tss, htmls, texts, langcol = [], [], [], [], []
    for i in range(n_rows):
        if rng.rand() < hot_domain_share:
            dom = int(rng.randint(0, max(n_domains // 25, 1)))
        else:
            dom = int(rng.randint(0, n_domains))
        urls.append(f"https://site{dom}.example/{i}")
        tss.append(_EPOCH_US + i * 1_000_000)
        langcol.append(langs[i % len(langs)])
        if invalid_every and i % invalid_every == invalid_every - 1:
            bad = b"\x00binary\xffjunk" if i % (2 * invalid_every) else b"\xff\xfe not utf8 \xff"
            htmls.append(bad)
            texts.append("")
            continue
        n_words = 30 + int(rng.randint(0, 170))
        words = [_WORD_POOL[int(j)] for j in rng.randint(0, len(_WORD_POOL), n_words)]
        body = " ".join(words)
        htmls.append(render_page(body, title=f"Page {i}"))
        texts.append(expected_extraction(body))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langcol, pa.string()),
        }
    )


def pages_batch(batch: pa.Table) -> pa.Table:
    """map_batches-friendly page synthesis: streaming version of
    ``pages_from_documents`` (same output schema), so sf0.1+ corpora are
    rendered block-by-block instead of materialized on the driver."""
    return pages_from_documents(batch)


def pages_from_documents(doc_table: pa.Table) -> pa.Table:
    """Wrap the driver testdata ``documents`` table (doc_id, text, lang,
    ...) into the F1 page schema.

    Precondition for byte-identity: ``text`` must be whitespace-normalized
    (no leading/trailing/double spaces, no newlines) because HTML
    rendering collapses whitespace; the driver testdata satisfies this
    (verified at all scale factors). Each doc's full text goes into the page
    verbatim; since testdata text has no newlines and fits one paragraph
    chunking pass, ``extract == "\\n".join(chunks)``; for the driver
    correctness query we use single-paragraph wrapping so extraction is
    byte-identical to ``text``."""
    doc_ids = doc_table["doc_id"].to_pylist()
    texts = doc_table["text"].to_pylist()
    langs = doc_table["lang"].to_pylist()
    # single-paragraph wrap: extraction is byte-identical to the original
    # doc text, which is what the driver's DuckDB oracle checks. Each
    # page carries 3 deterministic cross-site links in the sidebar
    # (cross_links_for) for the link-graph pipelines — sidebar-only, so
    # extraction byte-identity is untouched.
    htmls = [
        render_page(
            t,
            title=f"doc {d}",
            words_per_para=None,
            extra_links=cross_links_for(d),
        )
        for d, t in zip(doc_ids, texts)
    ]
    return pa.table(
        {
            "url": pa.array([f"https://docs.example/{d}" for d in doc_ids]),
            "warc_ts": pa.array(
                [_EPOCH_US + int(d) * 1_000_000 for d in doc_ids], pa.timestamp("us")
            ),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "doc_id": doc_table["doc_id"],
        }
    )


def pdfs_from_documents(
    batch, id_col: str = "doc_id", text_col: str = "text"
):
    """Deterministic single-page PDFs embedding each document's text as
    a literal-string content stream — half Flate-compressed (doc_id
    parity) so both decode paths run. Round-trip oracle: extracted text
    must equal documents.text byte-for-byte (the ADVERSARIAL coverage —
    escapes, filters, hex strings, broken streams — is pinned by
    tests/test_core_pdftext.py, non-circular).

    PRECONDITION (asserted, not silently violated): each text must be
    latin-1-encodable, single-line, and free of leading/trailing
    whitespace — extract_text_from_content strips each shown line and
    drops blank ones, so text outside this subset cannot round-trip
    byte-for-byte and would silently fail the driver gate. The sf*
    documents.text inputs satisfy this; a future testdata change that
    does not will fail HERE with a clear message instead of there."""
    import zlib

    import pyarrow as pa

    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    pdfs = []
    for i, txt in zip(ids, texts):
        t = txt or ""
        if ("\n" in t or "\r" in t) or t != t.strip():
            raise ValueError(
                f"pdfs_from_documents precondition violated for {id_col}={i}: "
                "text must be single-line with no leading/trailing whitespace "
                "for the byte-for-byte round-trip oracle"
            )
        try:
            t.encode("latin-1")
        except UnicodeEncodeError as e:
            raise ValueError(
                f"pdfs_from_documents precondition violated for {id_col}={i}: "
                "text must be latin-1-encodable for the round-trip oracle"
            ) from e
        esc = (
            t
            .replace("\\", "\\\\")
            .replace("(", "\\(")
            .replace(")", "\\)")
            .encode("latin-1")
        )
        content = b"BT /F1 12 Tf 72 720 Td (" + esc + b") Tj ET"
        if i % 2 == 0:
            body, filt = zlib.compress(content), b"/Filter /FlateDecode "
        else:
            body, filt = content, b""
        pdfs.append(
            b"%PDF-1.4\n1 0 obj\n<< " + filt + b"/Length "
            + str(len(body)).encode()
            + b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF\n"
        )
    return pa.table(
        {id_col: batch[id_col], "pdf": pa.array(pdfs, pa.binary())}
    )
