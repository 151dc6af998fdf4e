"""HTML → text extraction with the stdlib html.parser.

The reference converts HTML to PDF via WeasyPrint and routes it through
the PDF page pipeline (ingestion_service.py:505-520), falling back to raw
HTML text on failure. A layout renderer is out of scope here; the
engine-side equivalent is real text extraction: scripts/styles/head
dropped, block elements becoming line breaks, entities decoded — so the
indexed text is the page's content, not its markup.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = ["extract_html_text"]

_SKIP = {"script", "style", "head", "template", "noscript", "iframe"}
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "section", "article",
    "header", "footer", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote",
    "pre", "hr", "dt", "dd", "figcaption", "caption",
}
_CELL = {"td", "th"}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP:
            self._skip_depth += 1
        elif tag in _BLOCK:
            self.parts.append("\n")
        elif tag in _CELL:
            self.parts.append("\t")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK:
            self.parts.append("\n")

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self.parts.append(data)


def extract_html_text(html: str | bytes) -> str:
    """HTML string/bytes → plain text: markup-free, block-aware newlines,
    whitespace collapsed per line, blank runs capped at one empty line."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    raw = "".join(parser.parts)
    lines = [re.sub(r"[ \t\f\v]+", " ", ln).strip() for ln in raw.split("\n")]
    text = "\n".join(lines)
    text = re.sub(r"\n{3,}", "\n\n", text).strip()
    return text
