"""Generate the pinned extraction-conformance fixture parquet.

~50 hand-written adversarial pages (NOT synthesized from their expected
text — this kills the webgen circularity VERDICT r1 #3 called out).
Expected outputs were produced by ``core.extract.extract_main_text``,
manually reviewed, and FROZEN: regenerating this file must be a
deliberate act accompanying a reviewed behavior change, never a CI step.

Run: python tests/fixtures/extraction/make_fixtures.py [--check]
  --check: re-extract and diff against the frozen parquet (tripwire).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "fixtures.parquet")

W = "word " * 40  # filler prose long enough to win candidate scoring

PAGES: list[tuple[str, bytes]] = [
    # --- plain candidate structure -------------------------------------
    ("p01_simple_article",
     f"<html><body><div><p>{W}intro</p><p>{W}body</p></div></body></html>".encode()),
    ("p02_article_tag",
     f"<html><body><nav><a href=x>Home</a> <a href=y>About</a></nav>"
     f"<article><p>{W}story</p></article></body></html>".encode()),
    ("p03_main_tag",
     f"<body><main><p>{W}main text</p></main><footer>© site</footer></body>".encode()),
    ("p04_nested_candidates",
     f"<div><div><p>{W}outer</p><div><p>{W}inner one</p><p>{W}inner two</p>"
     f"</div></div></div>".encode()),
    ("p05_two_siblings_first_wins_tie",
     f"<body><div><p>{W}alpha</p></div><div><p>{W}alpha</p></div></body>".encode()),
    # --- link-density traps --------------------------------------------
    ("p06_nav_trap",
     (f"<body><div>" + "".join(f"<a href=l{i}>link {i} text text</a> " for i in range(30))
      + f"</div><div><p>{W}the real article content here</p></div></body>").encode()),
    ("p07_mixed_links_in_content",
     f"<div><p>{W}see <a href=x>reference</a> for details {W}</p></div>".encode()),
    ("p08_sidebar_lists",
     (f"<body><ul>" + "".join(f"<li><a href=t{i}>tag{i}</a></li>" for i in range(20))
      + f"</ul><article><p>{W}prose wins over tag soup</p></article></body>").encode()),
    # --- pre / blockquote / formatting ---------------------------------
    ("p09_pre_block",
     f"<article><p>{W}intro</p><pre>  code line one\n    indented two\n</pre>"
     f"<p>{W}outro</p></article>".encode()),
    ("p10_blockquote",
     f"<article><p>{W}claim</p><blockquote>quoted passage here</blockquote>"
     f"<p>{W}response</p></article>".encode()),
    ("p11_inline_formatting",
     f"<div><p>{W}with <b>bold</b> and <i>italic</i> and <code>x=1</code> runs</p></div>".encode()),
    ("p12_br_does_not_split_blocks",
     f"<div><p>{W}line one<br>line two<br/>line three</p></div>".encode()),
    ("p13_headings_inside_candidate",
     f"<article><h1>Title Here</h1><p>{W}lead</p><h2>Section</h2><p>{W}more</p></article>".encode()),
    # --- raw-text elements ---------------------------------------------
    ("p14_script_ignored",
     f"<body><script>var x = '<p>not text</p>';</script><div><p>{W}visible</p></div></body>".encode()),
    ("p15_style_ignored",
     f"<body><style>p {{ color: red; }}</style><div><p>{W}styled prose</p></div></body>".encode()),
    ("p16_textarea_raw",
     f"<body><textarea><p>markup inside textarea</p></textarea>"
     f"<div><p>{W}outside</p></div></body>".encode()),
    ("p17_title_not_content",
     f"<html><head><title>Page <Title></title></head><body><div><p>{W}body text</p></div></body></html>".encode()),
    ("p18_unterminated_script",
     f"<body><div><p>{W}before</p></div><script>var y = 1; // never closed".encode()),
    # --- comments / doctype / CDATA / PI -------------------------------
    ("p19_comments",
     f"<!-- header --><div><p>{W}real</p><!-- trailing note --></div>".encode()),
    ("p20_unterminated_comment_swallows",
     f"<div><p>{W}kept</p></div><!-- everything after is gone <p>lost</p>".encode()),
    ("p21_doctype_and_pi",
     f"<!DOCTYPE html><?xml version='1.0'?><div><p>{W}content</p></div>".encode()),
    ("p22_cdata_block",
     f"<div><![CDATA[ <p>cdata is not markup</p> ]]><p>{W}after cdata</p></div>".encode()),
    ("p23_conditional_comment",
     f"<!--[if IE]><p>ie only</p><![endif]--><div><p>{W}normal</p></div>".encode()),
    # --- broken / hostile markup ---------------------------------------
    ("p24_unclosed_p_tags",
     f"<div><p>{W}first para<p>{W}second para<p>{W}third</div>".encode()),
    ("p25_stray_lt_is_text",
     f"<div><p>{W}5 < 7 and 9 > 3 stays</p></div>".encode()),
    ("p26_bogus_end_tag_dropped",
     f"<div><p>{W}keep</p></123></></div>".encode()),
    ("p27_attr_with_gt_in_quotes",
     f"<div data-x=\"a > b\"><p>{W}quoted gt survives</p></div>".encode()),
    ("p28_bare_quote_junk_tag",
     f"<div><p>{W}before</p><b'>odd</b><p>{W}after</p></div>".encode()),
    ("p29_mismatched_nesting",
     f"<div><b><p>{W}bold para</b> tail</p><p>{W}next</p></div>".encode()),
    ("p30_uppercase_tags",
     f"<DIV><P>{W}upper case markup</P></DIV>".encode()),
    ("p31_self_closing_div",
     f"<div/><div><p>{W}the real one</p></div>".encode()),
    ("p32_deeply_nested",
     (("<div>" * 30) + f"<p>{W}deep</p>" + ("</div>" * 30)).encode()),
    ("p33_unquoted_attrs",
     f"<div class=main id=x1><p>{W}unquoted attrs fine</p></div>".encode()),
    ("p34_lt_at_eof",
     f"<div><p>{W}ends with stray <".encode()),
    # --- entities and unicode ------------------------------------------
    ("p35_entities",
     f"<div><p>{W}&amp; &lt;tag&gt; &quot;q&quot; &#65; &nbsp;end</p></div>".encode()),
    ("p36_unknown_entity_literal",
     f"<div><p>{W}&notanentity; stays</p></div>".encode()),
    ("p37_utf8_multibyte",
     f"<div><p>{W}héllo wörld — 漢字 and καλημέρα</p></div>".encode("utf-8")),
    ("p38_emoji",
     f"<div><p>{W}rocket 🚀 done</p></div>".encode("utf-8")),
    # --- whitespace handling -------------------------------------------
    ("p39_whitespace_collapse",
     f"<div><p>{W}lots   of \n\t spaces   collapse</p></div>".encode()),
    ("p40_leading_trailing_ws",
     f"<div><p>   {W}trimmed   </p></div>".encode()),
    ("p41_empty_paragraphs_skipped",
     f"<div><p></p><p>  </p><p>{W}only real one</p><p></p></div>".encode()),
    # --- fallback and degenerate ---------------------------------------
    ("p42_bare_text_fallback",
     f"just bare text with no markup at all {W}".encode()),
    ("p43_only_nav_still_extracts_best",
     "<body><div><a href=a>one</a> <a href=b>two</a></div></body>".encode()),
    ("p44_empty_page", b"<html><body></body></html>"),
    ("p45_whitespace_only", b"<div>   \n\t  </div>"),
    # --- validity drops -------------------------------------------------
    ("p46_nul_byte_binary", b"<div><p>text</p>\x00</div>"),
    ("p47_invalid_utf8", b"<div><p>bad \xff\xfe bytes</p></div>"),
    # --- tables and definition lists ------------------------------------
    ("p48_table_content",
     f"<div><table><tr><td>{W}cell one</td><td>{W}cell two</td></tr></table></div>".encode()),
    ("p49_dl_content",
     f"<div><dl><dt>Term</dt><dd>{W}definition text</dd></dl></div>".encode()),
    # NB: the outer <body> candidate wins here by total text mass (the
    # scorer is Arc90-style length-vs-link-density, not semantic-tag
    # priority), so comments ARE included — pinned as defined behavior.
    ("p50_body_wins_over_article_by_mass",
     (f"<body><article><p>{W}the story itself</p></article><div class=comments>"
      + "".join(f"<p>short comment {i}</p>" for i in range(10))
      + "</div></body>").encode()),
]


def build() -> pa.Table:
    sys.path.insert(0, os.path.abspath(os.path.join(HERE, "..", "..", "..")))
    from textalyzer_ray.core.extract import extract_main_text

    ids, htmls, texts, oks, reasons = [], [], [], [], []
    for pid, html in PAGES:
        r = extract_main_text(html)
        ids.append(pid)
        htmls.append(html)
        texts.append(r.text)
        oks.append(r.ok)
        reasons.append(r.drop_reason)
    return pa.table(
        {
            "page_id": pa.array(ids, pa.string()),
            "html": pa.array(htmls, pa.binary()),
            "expected": pa.array(texts, pa.string()),
            "ok": pa.array(oks, pa.bool_()),
            "drop_reason": pa.array(reasons, pa.string()),
        }
    )


if __name__ == "__main__":
    t = build()
    if "--check" in sys.argv:
        frozen = pq.read_table(OUT)
        assert t.equals(frozen), "extraction behavior drifted from frozen fixtures"
        print(f"OK: {t.num_rows} fixtures match frozen expectations")
    else:
        pq.write_table(t, OUT)
        print(f"wrote {OUT}: {t.num_rows} pages")
        for pid, txt, okv, why in zip(
            t["page_id"].to_pylist(),
            t["expected"].to_pylist(),
            t["ok"].to_pylist(),
            t["drop_reason"].to_pylist(),
        ):
            head = txt[:70].replace("\n", "\\n")
            print(f"  {pid:35s} ok={okv!s:5s} {why:12s} {head}")
