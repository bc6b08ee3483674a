"""Boilerplate-aware extraction (sources/boilerplate.py): block
segmentation + (length, link-density) classification per Boilerpipe
(WSDM 2010) / jusText. Gates: block-level output against a committed
expected fixture; end-to-end through warc_to_pages."""

from fever_spark.sources.boilerplate import extract_blocks, extract_main_text

ARTICLE_P1 = ("The quick brown fox jumped over the lazy dog while the "
              "researchers measured block-level text density across the "
              "whole crawled corpus.")
ARTICLE_P2 = ("Link density separates navigation chrome from prose: "
              "article paragraphs contain few anchors, while menus are "
              "made of nothing else, which is the entire signal.")

FIXTURE = f"""<!DOCTYPE html>
<html><head><title>Article title</title>
<script>var tracking = "pixel";</script>
<style>.nav {{ color: blue }}</style>
</head><body>
<nav><a href="/">Home</a> <a href="/news">News</a> <a href="/sports">Sports</a></nav>
<div id="cookie-banner">We use cookies to improve your experience.
<a href="/accept">Accept all cookies</a> <a href="/reject">Reject</a></div>
<div class="sidebar"><a href="/a">Trending one</a><a href="/b">Trending two</a></div>
<article>
<h1>Measuring text density at corpus scale</h1>
<p>{ARTICLE_P1}</p>
<p>{ARTICLE_P2}</p>
<p>Read more: <a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a> <a href="/4">four</a></p>
</article>
<footer>Copyright 2026 Example Corp. All rights reserved.
<a href="/terms">Terms</a> <a href="/privacy">Privacy</a></footer>
</body></html>""".encode()

# The committed expectation: what a correct extractor keeps, in order.
EXPECTED_TEXT = ("Measuring text density at corpus scale\n"
                 + ARTICLE_P1 + "\n" + ARTICLE_P2)


class TestBlocks:
    def test_block_level_classification(self):
        blocks = extract_blocks(FIXTURE)
        by_text = {b["text"]: b for b in blocks}
        # prose paragraphs: long, zero links -> content
        assert by_text[ARTICLE_P1]["content"] is True
        assert by_text[ARTICLE_P1]["link_density"] == 0.0
        assert by_text[ARTICLE_P2]["content"] is True
        # the "Read more" link farm: short + link-dominated -> boilerplate
        read_more = [b for b in blocks if b["text"].startswith("Read more")]
        assert read_more and read_more[0]["content"] is False
        assert read_more[0]["link_density"] > 0.33
        # heading kept under the relaxed heading threshold
        h1 = by_text["Measuring text density at corpus scale"]
        assert h1["heading"] is True and h1["content"] is True
        # pruned-by-construction subtrees never even appear as blocks
        joined = " ".join(b["text"] for b in blocks)
        for gone in ("cookies", "Trending", "Copyright", "tracking",
                     "color: blue", "Home"):
            assert gone not in joined

    def test_extract_matches_committed_fixture(self):
        assert extract_main_text(FIXTURE) == EXPECTED_TEXT

    def test_nav_only_page_keeps_heading_out(self):
        """A page with no prose: its <h1> is chrome, not content — but the
        no-content fallback still returns the pruned-tree text rather than
        an empty page."""
        page = (b"<html><body><h1>Site sections</h1>"
                b"<div><a href='/a'>A</a> <a href='/b'>B</a></div>"
                b"</body></html>")
        out = extract_main_text(page)
        assert "Site sections" in out  # fallback path: all blocks kept

    def test_short_page_degrades_to_stripper(self):
        assert extract_main_text(
            b"<html><body>Alpha page body</body></html>") == "Alpha page body"

    def test_entities_and_bad_utf8_tolerated(self):
        out = extract_main_text(
            b"<html><body><p>Caf\xe9 content &amp; more "
            b"that is long enough to be classified as a real content "
            b"block by length</p></body></html>")
        assert "content & more" in out
        assert "�" in out

    def test_unclosed_hinted_div_does_not_eat_document(self):
        """Tag-soup hazard: an unclosed pruned subtree swallows what
        follows at parse level; the page-level fallback must still return
        text (never a silently empty page)."""
        page = (b"<html><body><div class='menu'><a href='/'>Home</a>"
                b"<p>Orphan paragraph inside the unclosed menu div that "
                b"would be wrongly eaten by a naive subtree pruner.</p>"
                b"</body></html>")
        out = extract_main_text(page)
        assert out  # never empty


class TestPagesIntegration:
    def test_warc_to_pages_drops_boilerplate(self, spark, tmp_path):
        from tests.test_warc import _http, _record
        from fever_spark.sources.warc import read_warc, warc_to_pages

        (tmp_path / "a.warc").write_bytes(_record(
            b"response", b"http://art.example/a",
            b"2026-02-01T00:00:00Z", _http(FIXTURE)))
        [row] = warc_to_pages(read_warc(spark, str(tmp_path))).collect()
        assert row["text"] == EXPECTED_TEXT
        assert "cookies" not in row["text"]

    def test_explicit_stripper_keeps_everything(self, spark, tmp_path):
        from tests.test_warc import _http, _record
        from fever_spark.sources.warc import (html_to_text, read_warc,
                                              warc_to_pages)

        (tmp_path / "a.warc").write_bytes(_record(
            b"response", b"http://art.example/a",
            b"2026-02-01T00:00:00Z", _http(FIXTURE)))
        [row] = warc_to_pages(read_warc(spark, str(tmp_path)),
                              extractor=html_to_text).collect()
        assert "cookies" in row["text"]          # raw stripper keeps chrome
        assert ARTICLE_P1 in row["text"]


class TestExtractorProperties:
    """Hypothesis: the extractor is total over arbitrary crawl bytes —
    tag soup, truncated UTF-8, binary junk — and classification never
    invents text that was not in the input."""

    def test_never_crashes_on_arbitrary_bytes(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(st.binary(max_size=2048))
        def prop(data):
            out = extract_main_text(data)
            assert isinstance(out, str)

        prop()

    def test_markup_free_fast_path_resolves_charrefs(self):
        # the no-'<' fast path must match the parser path byte-for-byte,
        # INCLUDING character-reference resolution (convert_charrefs=True
        # unescapes &amp; even in an entity-only payload)
        plain = (b"Fish &amp; Chips at the pier \xc2\xa0 opened in 1952 "
                 b"and the queue runs long every single summer evening.")
        fast = extract_main_text(plain)
        parsed = extract_main_text(
            b"<html><body><p>" + plain + b"</p></body></html>")
        assert "Fish & Chips" in fast
        assert fast == parsed

    def test_never_crashes_on_random_markup(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        tags = st.sampled_from(["<div>", "</div>", "<p>", "</p>", "<a href='x'>",
                                "</a>", "<script>", "</script>", "<nav>",
                                "</nav>", "<br>", "<div class=menu>", "<h1>",
                                "</h1>", "<!--", "-->", "<", ">", "&amp;",
                                "&#65;", "&bogus;"])
        words = st.text(alphabet="abcdefg .!", min_size=0, max_size=30)

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.one_of(tags, words), max_size=40))
        def prop(parts):
            out = extract_main_text("".join(parts).encode())
            assert isinstance(out, str)

        prop()

    def test_output_words_come_from_input(self):
        """Every alphabetic word in the output appeared in the input
        (entities/whitespace aside) — the extractor selects, never
        fabricates."""
        import re
        from hypothesis import given, settings
        from hypothesis import strategies as st

        word = st.text(alphabet="abcdefghij", min_size=3, max_size=8)

        @settings(max_examples=100, deadline=None)
        @given(st.lists(word, min_size=1, max_size=20))
        def prop(ws):
            html = ("<html><body><p>" + " ".join(ws)
                    + ".</p></body></html>").encode()
            out = extract_main_text(html)
            in_words = set(ws)
            for w in re.findall(r"[a-j]{3,}", out):
                assert w in in_words

        prop()


class TestNearGoodPromotion:
    """jusText neighborhood rule: short prose adjacent to content blocks
    is content; isolated short chrome stays dropped."""

    def test_short_paragraph_between_good_ones_kept(self):
        page = ("<html><body>"
                "<p>" + ARTICLE_P1 + "</p>"
                "<p>A short but real aside.</p>"
                "<p>Another brief point here.</p>"
                "<p>" + ARTICLE_P2 + "</p>"
                "<nav><a href='/'>Home</a> <a href='/a'>A</a></nav>"
                "</body></html>").encode()
        out = extract_main_text(page)
        assert "short but real aside" in out
        assert "Another brief point" in out     # run of near-goods chains
        assert "Home" not in out

    def test_isolated_short_block_still_dropped(self):
        page = ("<html><body>"
                "<div>Short stray fragment.</div>"
                "<div><a href='/1'>x</a> <a href='/2'>y</a></div>"
                "<p>" + ARTICLE_P1 + "</p>"
                "<div><a href='/3'>z</a> <a href='/4'>w</a></div>"
                "<div>Trailing fragment here.</div>"
                "</body></html>").encode()
        out = extract_main_text(page)
        # the link rows between fragment and article break adjacency
        assert "Short stray fragment" not in out
        assert "Trailing fragment" not in out
        assert ARTICLE_P1 in out

    def test_committed_fixture_unchanged(self):
        # the canonical fixture has no near-good neighbors: byte-identical
        assert extract_main_text(FIXTURE) == EXPECTED_TEXT
