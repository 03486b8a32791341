"""HTML boilerplate stripping (operator O20 in SURVEY.md §2.2).

Arc90/Readability-style main-content extraction: segment the document into
blocks at block-level tags, then score each block with shallow text features
(text length, link density, boilerplate ancestry) and keep only main-content
blocks. Published basis: Arc90 Readability heuristics; Kohlschütter et al.,
"Boilerplate Detection Using Shallow Text Features" (WSDM 2010). This is the
deterministic replacement for the reference's VLM extraction call
(/root/reference/src/pdf_extractor/client.py:37-38).

Deterministic scoring rules (documented so the oracle is pinned):

* a block whose open-tag ancestry includes a BOILERPLATE tag is dropped;
* a block with no text is ignored (counted neither kept nor dropped);
* link density  = anchor-text chars / total chars; ``> 0.33`` -> dropped;
* text shorter than ``MIN_BLOCK_CHARS`` is dropped unless it is a heading.

The parser is the stdlib ``html.parser`` streaming tokenizer — no DOM build,
single pass, O(payload bytes); inside ``mapInPandas`` this runs batched over
Arrow record batches.
"""

from __future__ import annotations

from html.parser import HTMLParser

BOILERPLATE_TAGS = frozenset(
    {"nav", "footer", "header", "aside", "script", "style", "form", "noscript",
     "button", "iframe", "select", "option"}
)
BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "main", "li", "ul", "ol", "table", "tr",
     "td", "th", "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6",
     "body", "html"}
)
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "title"})
VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)
MAX_LINK_DENSITY = 0.33
MIN_BLOCK_CHARS = 15


class _BlockParser(HTMLParser):
    """Streaming segmentation of an HTML payload into scored text blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        self.blocks: list[dict] = []
        self._cur: dict | None = None

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        if self._cur is not None:
            self.blocks.append(self._cur)
            self._cur = None

    def _open_block(self, tag: str) -> None:
        self._flush()
        self._cur = {
            "tag": tag,
            "parts": [],
            "anchor_chars": 0,
            "boiler": any(t in BOILERPLATE_TAGS for t in self.stack),
        }

    # -- HTMLParser hooks -------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        tag = tag.lower()
        if tag in VOID_TAGS:
            if tag in ("br", "hr") and self._cur is not None:
                self._cur["parts"].append("\n")
            return
        self.stack.append(tag)
        if tag in BLOCK_TAGS or tag in BOILERPLATE_TAGS:
            self._open_block(tag)

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        # pop to the matching open tag (tolerates misnesting deterministically)
        if tag in self.stack:
            while self.stack and self.stack[-1] != tag:
                self.stack.pop()
            if self.stack:
                self.stack.pop()
        if tag in BLOCK_TAGS or tag in BOILERPLATE_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if not data or not data.strip():
            return
        if any(t in ("script", "style") for t in self.stack):
            return
        if self._cur is None:
            self._open_block("_text")
        self._cur["parts"].append(data)
        if "a" in self.stack:
            self._cur["anchor_chars"] += len(data.strip())


def html_strip_one(payload: str) -> tuple[list[str], int, int, bool]:
    """Strip boilerplate from one HTML payload.

    Returns ``(kept_block_texts, n_kept, n_dropped, parse_failed)``. On parser
    error the payload degrades to a regex-free fallback (tags removed by the
    tolerant parser up to the failure point are lost; we mark parse_failed and
    emit nothing, letting the caller fall back to normalized raw text).
    """
    parser = _BlockParser()
    try:
        parser.feed(payload)
        parser.close()
    except Exception:
        return [], 0, 0, True

    parser._flush()
    kept: list[str] = []
    n_kept = 0
    n_dropped = 0
    for blk in parser.blocks:
        text = " ".join(" ".join(blk["parts"]).split())
        if not text:
            continue
        chars = len(text)
        link_density = blk["anchor_chars"] / chars if chars else 0.0
        drop = (
            blk["boiler"]
            or blk["tag"] in BOILERPLATE_TAGS
            or link_density > MAX_LINK_DENSITY
            or (chars < MIN_BLOCK_CHARS and blk["tag"] not in HEADING_TAGS)
        )
        if drop:
            n_dropped += 1
        else:
            n_kept += 1
            kept.append(text)
    return kept, n_kept, n_dropped, False
