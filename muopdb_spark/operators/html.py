"""HTML -> text extraction — the step every crawl pipeline runs
before any text curation (C4/CCNet/RefinedWeb all start from WET/WARC
HTML): strip markup, drop non-content subtrees (script/style/head,
nav/aside/footer boilerplate), decode entities, and normalize
whitespace, keeping block boundaries as newlines.

Built on the stdlib `html.parser` (tolerant of real-world tag soup —
unclosed tags, stray brackets, broken attributes never raise), run
executor-side over Arrow batches via mapInPandas. No external parser
dependencies; lxml/bs4-grade DOM fidelity is out of scope by design —
the goal is training-text recovery, not rendering.

Reference parity note: the reference engine (hicder/muopdb) has no
HTML operators; this family is brief-driven (training-data pipeline
requirement) like urls.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

from pyspark.sql import DataFrame

# subtrees whose text is never content
_DROP = {"script", "style", "head", "template", "noscript", "svg"}
# boilerplate subtrees dropped by default (extract_text(boilerplate=
# False) keeps them — e.g. when mining navigation anchors)
_BOILER = {"nav", "aside", "footer", "header", "form"}
# elements that imply a block boundary (newline) around their text
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
    "section", "article", "main", "figure", "figcaption", "hr",
    "title", "body",
}


class _TextExtractor(HTMLParser):
    def __init__(self, drop_boilerplate: bool) -> None:
        super().__init__(convert_charrefs=True)
        self._drop = _DROP | (_BOILER if drop_boilerplate else set())
        self._drop_stack: list[str] = []
        self._parts: list[str] = []
        self._links: list[tuple[str, str]] = []
        self._title_parts: list[str] = []
        self._in_title = False
        self._cur_href: str | None = None
        self._cur_anchor: list[str] = []

    def handle_starttag(self, tag, attrs):
        if self._in_title and tag != "title":
            # browser recovery: an unclosed <title> ends at the next
            # tag — otherwise tag soup routes the whole page into it
            self._in_title = False
        if tag in self._drop:
            self._drop_stack.append(tag)
        if tag in _BLOCK:
            self._parts.append("\n")
        if tag == "title":
            self._in_title = True
        if tag == "a":
            href = dict(attrs).get("href")
            if href:
                # a nested <a> implicitly closes the pending one
                # (browser behavior) — emit it, never overwrite-drop
                self._flush_link()
                self._cur_href = href
                self._cur_anchor = []

    def handle_endtag(self, tag):
        if tag in self._drop and tag in self._drop_stack:
            # pop only a MATCHING open drop tag: a stray mismatched
            # close (</footer> inside an open <nav>) must not
            # un-suppress the subtree that is still open
            for i in range(len(self._drop_stack) - 1, -1, -1):
                if self._drop_stack[i] == tag:
                    del self._drop_stack[i]
                    break
        if tag in _BLOCK:
            self._parts.append("\n")
        if tag == "title":
            self._in_title = False
        if tag == "a":
            self._flush_link()

    def _flush_link(self) -> None:
        if self._cur_href is not None:
            self._links.append(
                (self._cur_href, " ".join("".join(self._cur_anchor).split()))
            )
            self._cur_href = None
            self._cur_anchor = []

    def close(self):
        # truncated crawl pages: an <a href> still open at EOF is a
        # real link — flush it rather than silently dropping it
        super().close()
        self._flush_link()

    def handle_data(self, data):
        if self._in_title:
            self._title_parts.append(data)
        if self._drop_stack:
            return
        self._parts.append(data)
        if self._cur_href is not None:
            self._cur_anchor.append(data)

    def text(self) -> str:
        # collapse runs of whitespace within lines, runs of blank
        # lines between them
        lines = "".join(self._parts).split("\n")
        out: list[str] = []
        for ln in lines:
            ln = " ".join(ln.split())
            if ln:
                out.append(ln)
        return "\n".join(out)

    def title(self) -> str:
        return " ".join("".join(self._title_parts).split())


def html_to_text(
    html: str, *, drop_boilerplate: bool = True,
) -> tuple[str, str, list[tuple[str, str]]]:
    """(text, title, [(href, anchor_text)]) of one document. Total
    over tag soup: the stdlib parser recovers rather than raises."""
    p = _TextExtractor(drop_boilerplate)
    p.feed(html)
    p.close()
    return p.text(), p.title(), p._links


EXTRACT_SCHEMA = (
    "doc_id long, text string, title string, n_links int"
)


def extract_text(
    pages: DataFrame, *, html_col: str = "html", id_col: str = "doc_id",
    drop_boilerplate: bool = True,
) -> DataFrame:
    """(doc_id, text, title, n_links) per page — Arrow-batched
    mapInPandas, executor-side, total over malformed markup."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "text": [], "title": [], "n_links": []}
            for did, raw in zip(pdf[id_col], pdf[html_col]):
                text, title, links = html_to_text(
                    raw or "", drop_boilerplate=drop_boilerplate
                )
                out["doc_id"].append(did)
                out["text"].append(text)
                out["title"].append(title)
                out["n_links"].append(len(links))
            yield pd.DataFrame(out)

    return pages.mapInPandas(gen, EXTRACT_SCHEMA)


LINK_SCHEMA = "doc_id long, href string, anchor string"


def extract_links(
    pages: DataFrame, *, html_col: str = "html", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, href, anchor) — one row per <a href>; feeds the URL
    family (urls.url_normalize / url_registered_domain) for link-graph
    work."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "href": [], "anchor": []}
            for did, raw in zip(pdf[id_col], pdf[html_col]):
                # keep boilerplate: nav/footer links are link-graph
                # signal, and suppression would blank their anchors
                _t, _ti, links = html_to_text(
                    raw or "", drop_boilerplate=False
                )
                for href, anchor in links:
                    out["doc_id"].append(did)
                    out["href"].append(href)
                    out["anchor"].append(anchor)
            yield pd.DataFrame(out)

    return pages.mapInPandas(gen, LINK_SCHEMA)
