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


# ------------------------------------------------------------------
# html2 (r15): density-based main-content extraction.
#
# extract_text suppresses boilerplate *tags* (nav/footer/...), but
# production curation (jusText, trafilatura as used by RefinedWeb)
# classifies *blocks* by text/link density, so menus and link farms
# living in plain <div>s are dropped too. This pass segments the page
# into text blocks at block-boundary tags and classifies each block:
#
#   bad   if link_density > max_link_density   (menus, link lists)
#   good  if n_words >= min_words              (real prose)
#   short otherwise — adopts its context: good iff BOTH nearest core
#         neighbours are good (document edges count as bad), except a
#         short <h1>..<h6> headline, which is good iff the NEXT core
#         neighbour is good (the jusText headline rule: keep the
#         title of a kept section, drop headings over dropped nav)
#
# Pure Arrow pass over the same stdlib-parser block boundaries as
# extract_text — no external parser, executor-side via mapInPandas.


_HEADINGS = {"h1", "h2", "h3", "h4", "h5", "h6"}


class _BlockExtractor(HTMLParser):
    """Segment a page into text blocks at block-boundary tags,
    tracking per block: normalized text, word count, anchor-char
    count (for link density), and heading origin. script/style/head
    subtrees are structurally dropped; nav/footer/aside CONTENT is
    kept here — density classification decides its fate."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop_stack: list[str] = []
        self._blocks: list[dict] = []
        self._parts: list[str] = []
        self._anchor_chars = 0
        self._in_anchor = 0
        self._is_heading = False

    def _flush_block(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            n_chars = len(text)
            self._blocks.append({
                "text": text,
                "n_words": len(text.split()),
                "link_density": min(self._anchor_chars, n_chars) / n_chars,
                "is_heading": self._is_heading,
            })
        self._parts = []
        self._anchor_chars = 0
        self._is_heading = False
        # an anchor never counts past its block: a block boundary ends
        # the anchor run for density purposes, so tag soup with an
        # UNCLOSED <a> (very common) poisons at most its own block —
        # without this reset one stray '<a href=x>Home</div><p>prose'
        # counted every later block as 100% link chars and the whole
        # article was silently dropped (r15 review finding, verified)
        self._in_anchor = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            self._drop_stack.append(tag)
        if tag in _BLOCK or tag in _HEADINGS:
            self._flush_block()
            self._is_heading = tag in _HEADINGS
        if tag == "a":
            # a nested <a> implicitly closes the pending one (browser
            # behavior, same rule as _TextExtractor) — never let the
            # depth counter exceed 1 or a malformed '<a><a>' pins the
            # extractor in anchor mode
            self._in_anchor = 1

    def handle_endtag(self, tag):
        if tag in _DROP and tag in self._drop_stack:
            for i in range(len(self._drop_stack) - 1, -1, -1):
                if self._drop_stack[i] == tag:
                    del self._drop_stack[i]
                    break
        if tag in _BLOCK or tag in _HEADINGS:
            self._flush_block()
        if tag == "a":
            self._in_anchor = 0

    def handle_data(self, data):
        if self._drop_stack:
            return
        self._parts.append(data)
        if self._in_anchor:
            self._anchor_chars += len("".join(data.split()))


def classify_blocks(
    blocks: list[dict], *, max_link_density: float = 0.33,
    min_words: int = 10,
) -> list[bool]:
    """One keep/drop verdict per block (see module comment for the
    rules). Pure function over the block feature dicts so the policy
    is unit-testable without a parser in the loop."""
    n = len(blocks)
    core: list[bool | None] = []
    for b in blocks:
        if b["link_density"] > max_link_density:
            core.append(False)
        elif b["n_words"] >= min_words:
            core.append(True)
        else:
            core.append(None)
    prev_core = [False] * n
    cur = False
    for i in range(n):
        prev_core[i] = cur
        if core[i] is not None:
            cur = bool(core[i])
    next_core = [False] * n
    cur = False
    for i in range(n - 1, -1, -1):
        next_core[i] = cur
        if core[i] is not None:
            cur = bool(core[i])
    out: list[bool] = []
    for i, b in enumerate(blocks):
        if core[i] is not None:
            out.append(bool(core[i]))
        elif b["is_heading"]:
            out.append(next_core[i])
        else:
            out.append(prev_core[i] and next_core[i])
    return out


def html_main_content(
    html: str, *, max_link_density: float = 0.33, min_words: int = 10,
) -> tuple[str, int, int]:
    """Pure referee: (main_text, n_blocks, n_kept) of one page. Kept
    blocks join with newlines, each block whitespace-normalized."""
    p = _BlockExtractor()
    p.feed(html)
    p.close()
    p._flush_block()
    keep = classify_blocks(
        p._blocks, max_link_density=max_link_density,
        min_words=min_words,
    )
    kept = [b["text"] for b, k in zip(p._blocks, keep) if k]
    return "\n".join(kept), len(p._blocks), sum(keep)


MAIN_SCHEMA = "doc_id long, text string, n_blocks int, n_kept int"


def extract_main_content(
    pages: DataFrame, *, html_col: str = "html", id_col: str = "doc_id",
    max_link_density: float = 0.33, min_words: int = 10,
) -> DataFrame:
    """(doc_id, text, n_blocks, n_kept) per page — the density
    classifier over Arrow batches; total over tag soup like
    extract_text."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "text": [], "n_blocks": [], "n_kept": []}
            for did, raw in zip(pdf[id_col], pdf[html_col]):
                text, nb, nk = html_main_content(
                    raw or "", max_link_density=max_link_density,
                    min_words=min_words,
                )
                out["doc_id"].append(did)
                out["text"].append(text)
                out["n_blocks"].append(nb)
                out["n_kept"].append(nk)
            yield pd.DataFrame(out)

    return pages.mapInPandas(gen, MAIN_SCHEMA)
