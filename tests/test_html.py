"""HTML -> text extraction (operators/html.py): stdlib-parser tag
soup tolerance, boilerplate/script suppression, block boundaries,
entity decoding, title/link extraction, and the Spark operators."""

from __future__ import annotations

import numpy as np
import pytest

from muopdb_spark.operators.html import (
    extract_links,
    extract_text,
    html_to_text,
)


def test_basic_extraction():
    doc = ("<html><head><title> My  Page </title>"
           "<style>p{a:b}</style><script>var x=\"<p>hi</p>\";</script>"
           "</head><body><h1>Header&nbsp;One</h1>"
           "<p>First   paragraph with <b>bold</b> &amp; entities.</p>"
           "<div>Second<br>block</div></body></html>")
    text, title, links = html_to_text(doc)
    assert title == "My Page"
    assert text.split("\n") == [
        # &nbsp; decodes to U+00A0, which the per-line whitespace
        # collapse (str.split — unicode-aware) normalizes to a space
        "Header One",
        "First paragraph with bold & entities.",
        "Second",
        "block",
    ]
    assert links == []


def test_boilerplate_suppression_toggle():
    doc = ("<body><nav><a href='/h'>Home</a></nav><p>real</p>"
           "<footer>copyright</footer></body>")
    on, _t, _l = html_to_text(doc)
    off, _t2, _l2 = html_to_text(doc, drop_boilerplate=False)
    assert "real" in on and "Home" not in on and "copyright" not in on
    assert "Home" in off and "copyright" in off


def test_script_cdata_decoys_never_leak():
    # markup inside a script string must not surface as text, and a
    # '</p>' inside the string must not terminate suppression
    doc = ("<script>var a = \"<p>decoy</p>\"; if (x<2 && y>3) {}"
           "</script><p>after</p>")
    text, _t, _l = html_to_text(doc)
    assert text == "after"


def test_tag_soup_totality_and_recovery():
    for junk in ("<<<>>>", "<a href=", "\x00\xff<p", "",
                 "<p>" * 5000, "<b><i>nested</b></i> wrong order"):
        html_to_text(junk)  # must not raise
    text, _t, _l = html_to_text("<p>Broken <unclosed <soup</p>done")
    assert "Broken" in text and "done" in text


def test_links_and_anchors():
    doc = ("<nav><a href='/h'>Home</a></nav>"
           "<a href='https://x.com/a'>link  text</a>"
           "<a name='no-href'>skipped</a>")
    _text, _t, links = html_to_text(doc, drop_boilerplate=False)
    assert links == [("/h", "Home"), ("https://x.com/a", "link text")]


def test_extract_text_operator(spark):
    pages = spark.createDataFrame(
        [(0, "<title>A</title><p>one</p>"),
         (1, "<p>two <a href='/x'>x</a></p>"),
         (2, None)],
        "doc_id long, html string",
    )
    rows = {r.doc_id: r for r in extract_text(pages).collect()}
    assert rows[0].title == "A" and rows[0].text == "A\none"
    assert rows[1].text == "two x" and rows[1].n_links == 1
    assert rows[2].text == "" and rows[2].n_links == 0


def test_extract_links_feeds_url_family(spark):
    from muopdb_spark.operators.urls import url_registered_domain

    pages = spark.createDataFrame(
        [(0, "<a href='HTTPS://WWW.Ex.COM/p?utm_a=1'>E</a>"
             "<nav><a href='http://b.co.uk/q'>B</a></nav>")],
        "doc_id long, html string",
    )
    links = extract_links(pages)
    assert links.count() == 2  # nav links kept (anchors intact)
    doms = {r.d for r in links.select(
        url_registered_domain("href").alias("d")).collect()}
    assert doms == {"ex.com", "b.co.uk"}


def test_unclosed_title_recovers_like_browsers():
    text, title, _ = html_to_text(
        "<title>Foo<body><p>long article text</p>")
    assert title == "Foo"
    assert "long article text" in text
    assert "long article" not in title


def test_mismatched_boilerplate_close_keeps_suppression():
    text, _t, _l = html_to_text(
        "<nav>menu</footer>junk links</nav><p>real</p>")
    assert "junk links" not in text and "menu" not in text
    assert "real" in text


def test_unclosed_anchor_at_eof_is_flushed():
    # truncated crawl page: <a href> open at EOF is still a link
    _t, _ti, links = html_to_text("<p>see <a href='/x'>the docs")
    assert links == [("/x", "the docs")]


def test_nested_anchor_emits_pending_link():
    # a nested <a> implicitly closes the pending one (browser
    # behavior) — both links survive, neither anchor bleeds
    _t, _ti, links = html_to_text(
        "<a href='/a'>first <a href='/b'>second</a> tail"
    )
    assert links == [("/a", "first"), ("/b", "second")]


# ---------------------------------------------------- html2 (r15):
# density-based main-content extraction

from muopdb_spark.operators.html import (  # noqa: E402
    classify_blocks,
    extract_main_content,
    html_main_content,
)


def _blk(text, anchor_frac=0.0, heading=False):
    n = len(text)
    return {"text": text, "n_words": len(text.split()),
            "link_density": anchor_frac, "is_heading": heading}


LONG = ("real prose with plenty of words in it to pass the core "
        "length threshold easily")


def test_classify_core_rules():
    # long + low density = good; high density = bad regardless of length
    assert classify_blocks([_blk(LONG)]) == [True]
    assert classify_blocks([_blk(LONG, anchor_frac=0.9)]) == [False]
    # short at document edges (no good neighbours) = bad
    assert classify_blocks([_blk("short tail")]) == [False]


def test_classify_context_rules():
    blocks = [
        _blk("Home About Contact", anchor_frac=1.0),   # menu: bad
        _blk("Section title", heading=True),           # heading -> next
        _blk(LONG),                                    # good
        _blk("short middle"),                          # good-good ctx
        _blk(LONG),                                    # good
        _blk("short tail"),                            # good-bad ctx
        _blk("more links here", anchor_frac=0.8),      # bad
        _blk("copyright foo"),                         # edge ctx: bad
    ]
    assert classify_blocks(blocks) == [
        False, True, True, True, True, False, False, False,
    ]
    # a heading over dropped content is dropped too
    assert classify_blocks([
        _blk("Menu", heading=True),
        _blk("links links links", anchor_frac=1.0),
    ]) == [False, False]


def test_main_content_drops_divs_the_tag_pass_keeps():
    """The r15 upgrade case: menus and link farms in PLAIN <div>s —
    invisible to tag-based boilerplate suppression — are dropped by
    density; prose, its heading, and short blocks between prose
    survive."""
    page = (
        "<html><head><title>T</title><style>p{x}</style></head><body>"
        '<div><a href="/a">Home</a> <a href="/b">About</a>'
        ' <a href="/c">Contact</a></div>'
        "<h1>Section title</h1>"
        f"<p>{LONG}</p>"
        "<div>short middle</div>"
        f"<p>{LONG} again</p>"
        "<div>tail 3</div>"
        '<div><a href="/x">more</a> <a href="/y">links</a> here</div>'
        "<footer>copyright foo</footer></body></html>"
    )
    text, n_blocks, n_kept = html_main_content(page)
    assert text.split("\n") == [
        "Section title", LONG, "short middle", f"{LONG} again",
    ]
    assert (n_blocks, n_kept) == (8, 4)
    # the old tag-suppression pass keeps the link-farm div's text
    old, _, _ = html_to_text(page)
    assert "more links here" in old.replace("\n", " ")
    assert "more" not in text and "copyright" not in text


def test_main_content_tag_soup_total():
    # malformed markup never raises; empty/None-ish input yields empty
    for soup in ("", "<<<>>>", "<a href=oops<p>x", "<div" , "plain"):
        t, nb, nk = html_main_content(soup)
        assert isinstance(t, str)
    # unclosed tags: block flush at EOF still classifies
    t, nb, nk = html_main_content(f"<p>{LONG}")
    assert t == LONG and nk == 1


def test_extract_main_content_operator(spark):
    rows = [
        (1, '<div><a href="/m">Menu Menu</a></div>'
            f"<h2>Title here</h2><p>{LONG}</p><footer>foot note</footer>"),
        (2, '<div><a href="/m">only links</a></div>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r for r in
           extract_main_content(df).collect()}
    assert got[1]["text"] == f"Title here\n{LONG}"
    assert got[1]["n_kept"] == 2
    assert got[2]["text"] == "" and got[2]["n_kept"] == 0


def test_unclosed_and_nested_anchors_do_not_poison_blocks():
    """r15 review fix: an UNCLOSED <a> (ubiquitous tag soup) counted
    every later block as 100% link chars, silently dropping whole
    articles; nested <a> pinned the extractor in anchor mode. An
    anchor now never counts past its block and nesting implicitly
    closes."""
    assert html_main_content(
        f'<div><a href="/a">Home</div><p>{LONG}</p>'
    )[0] == LONG
    assert html_main_content(
        f'<div><a href="/a"><a href="/b">Home About</a></div><p>{LONG}</p>'
    )[0] == LONG
    # a closed menu is still dropped on density
    text, nb, nk = html_main_content(
        '<div><a href="/a">Home</a> <a href="/b">About</a>'
        f' <a href="/c">Contact</a></div><p>{LONG}</p>'
    )
    assert text == LONG and (nb, nk) == (2, 1)


def test_main_content_random_soup_fuzz():
    """Seeded random tag-soup fuzz (r16, the unigram-fuzz pattern):
    html_main_content and html_to_text must be TOTAL over arbitrary
    byte salads — never raise, keep counts consistent — because at
    corpus scale every malformation that can exist does."""
    import random

    from muopdb_spark.operators.html import html_to_text

    rng = random.Random(16)
    frags = [
        "<p>", "</p>", "<a href='x'>", "</a>", "<div", ">", "<",
        "<!--", "-->", "<script>", "</script>", "<h1>", "</h1>",
        "&amp;", "&#x41;", "&bogus;", "text ", "0 ", "é", "\n",
        "<![CDATA[", "]]>", "<a><a>", "</title>", "<meta/",
    ]
    for _ in range(300):
        soup = "".join(rng.choice(frags) for _ in range(rng.randint(0, 40)))
        t, nb, nk = html_main_content(soup)
        assert 0 <= nk <= nb
        assert isinstance(t, str)
        txt, _title, links = html_to_text(soup)
        assert isinstance(txt, str) and isinstance(links, list)
