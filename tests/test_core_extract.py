"""Extractor oracle tests: determinism, boilerplate rejection, validity
rules (file_utils.rs:134-144 semantics), and byte-identical round trip
with the synthetic page generator (FIXTURES.md F1 invariant)."""

import pyarrow as pa

from textalyzer_ray.core.extract import extract_main_text
from textalyzer_ray.sources.webgen import (
    expected_extraction,
    pages_from_documents,
    render_page,
    synth_corpus,
)


class TestValidity:
    def test_nul_byte_is_binary(self):
        r = extract_main_text(b"<html>\x00</html>")
        assert not r.ok and r.drop_reason == "binary"

    def test_invalid_utf8_dropped(self):
        r = extract_main_text(b"<html>\xff\xfe</html>")
        assert not r.ok and r.drop_reason == "invalid_utf8"

    def test_empty_dropped(self):
        r = extract_main_text(b"")
        assert not r.ok and r.drop_reason == "empty"


class TestExtraction:
    def test_main_content_beats_boilerplate(self):
        body = "this is the real article content " * 20
        html = render_page(body.strip(), words_per_para=None)
        r = extract_main_text(html)
        assert r.ok
        assert r.text == body.strip()

    def test_multi_paragraph_roundtrip(self):
        body = " ".join(f"word{i}" for i in range(200))
        html = render_page(body, words_per_para=40)
        r = extract_main_text(html)
        assert r.ok
        assert r.text == expected_extraction(body, words_per_para=40)
        assert r.text.count("\n") == 4  # 200 words / 40 per para

    def test_nav_and_footer_excluded(self):
        html = render_page("unique main words " * 30)
        r = extract_main_text(html)
        assert "Category" not in r.text
        assert "Privacy policy" not in r.text
        assert "Related article" not in r.text

    def test_entities_unescaped(self):
        body = "fish & chips are < great > still"
        html = render_page(body, words_per_para=None)
        r = extract_main_text(html)
        assert r.text == body

    def test_deterministic(self):
        html = render_page("some words " * 50)
        assert extract_main_text(html).text == extract_main_text(html).text

    def test_link_density_rejects_link_farm(self):
        html = (
            "<html><body>"
            '<div id="links">'
            + "".join(f'<a href="/{i}">spammy link text number {i} here</a> ' for i in range(30))
            + "</div>"
            '<div id="main"><p>short but real prose sentence with actual content words</p>'
            "<p>and another real sentence of meaningful body text here</p></div>"
            "</body></html>"
        ).encode()
        r = extract_main_text(html)
        assert "spammy" not in r.text
        assert "real prose" in r.text

    def test_unclosed_tags_tolerated(self):
        html = b"<html><body><div><p>alpha beta gamma delta epsilon words here<p>more text follows</div>"
        r = extract_main_text(html)
        assert r.ok
        assert "alpha beta" in r.text

    def test_bare_text_fallback(self):
        r = extract_main_text(b"just plain text with no markup at all")
        assert r.ok
        assert r.text == "just plain text with no markup at all"


class TestSynthCorpus:
    def test_corpus_invariant_batch(self):
        tbl = synth_corpus(60, seed=7, invalid_every=10)
        n_bad = 0
        for url, html, text in zip(
            tbl["url"].to_pylist(), tbl["html"].to_pylist(), tbl["text"].to_pylist()
        ):
            r = extract_main_text(html)
            if text == "":
                n_bad += 1
                assert not r.ok
            else:
                assert r.ok, url
                assert r.text == text, url  # byte-identical per url
        assert n_bad == 6
        assert tbl.schema.names == ["url", "warc_ts", "html", "text", "lang"]
        assert tbl.schema.field("html").type == pa.binary()

    def test_corpus_deterministic(self):
        a = synth_corpus(20, seed=3)
        b = synth_corpus(20, seed=3)
        assert a.equals(b)

    def test_pages_from_documents_byte_identity(self):
        docs = pa.table(
            {
                "doc_id": [1, 2],
                "text": [("alpha beta gamma " * 30).strip(), ("uno dos tres " * 10).strip()],
                "lang": ["en", "es"],
            }
        )
        pages = pages_from_documents(docs)
        for html, text in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
            assert extract_main_text(html).text == text


class TestHeadMeta:
    def _page(self, head_extra: str, title: str = "T") -> bytes:
        from textalyzer_ray.sources.webgen import render_page

        return render_page(
            "some body words here", title=title, head_extra=head_extra
        )

    def test_all_fields(self):
        from textalyzer_ray.core.extract import extract_head_meta

        h = self._page(
            '<link rel="canonical" href="https://c.example/x">'
            '<meta name="description" content="a desc">'
            '<meta property="og:site_name" content="sN">'
            '<meta property="og:title" content="oT">'
            '<meta name="robots" content="noindex">'
        )
        m = extract_head_meta(h)
        assert m == {
            "title": "T",
            "canonical": "https://c.example/x",
            "description": "a desc",
            "robots": "noindex",
            "og_site_name": "sN",
            "og_title": "oT",
        }

    def test_entity_escaping_round_trips(self):
        import html as _h

        from textalyzer_ray.core.extract import extract_head_meta

        desc = 'quotes " and <tags> & amps \' ok'
        h = self._page(
            f'<meta name="description" content="{_h.escape(desc)}">',
            title="A & B <C>",
        )
        m = extract_head_meta(h)
        assert m["description"] == desc
        assert m["title"] == "A & B <C>"

    def test_first_occurrence_wins_and_case_insensitive(self):
        from textalyzer_ray.core.extract import extract_head_meta

        h = self._page(
            '<META NAME="Description" CONTENT="first">'
            '<meta name="description" content="second">'
            '<LINK REL="Canonical" HREF="https://one">'
            '<link rel="canonical" href="https://two">'
        )
        m = extract_head_meta(h)
        assert m["description"] == "first"
        assert m["canonical"] == "https://one"

    def test_absent_and_invalid(self):
        from textalyzer_ray.core.extract import extract_head_meta

        plain = self._page("")
        m = extract_head_meta(plain)
        assert m["title"] == "T" and m["canonical"] is None
        assert m["description"] is None and m["robots"] is None
        none = {k: None for k in m}
        assert extract_head_meta(b"\x00junk") == none
        assert extract_head_meta(b"\xff\xfe bad") == none
        assert extract_head_meta(b"<p>headless</p>")["title"] is None

    def test_body_meta_beyond_head_slice_ignored(self):
        from textalyzer_ray.core.extract import extract_head_meta

        h = (
            b"<html><head><title>t</title></head><body>"
            b'<meta name="description" content="smuggled">'
            b"</body></html>"
        )
        assert extract_head_meta(h)["description"] is None

    def test_meta_without_content_skipped(self):
        from textalyzer_ray.core.extract import extract_head_meta

        h = self._page('<meta name="description">')
        assert extract_head_meta(h)["description"] is None
