"""Lossless HTML wire format for span documents, and the parser that recovers
them — the HTTP transport's page representation.

The reference crawler fetches real HTML with a pooled browser and parses it
into interleaved text/media content (reference actions.py:218-293; scraping
strategy swap tasks.py:593). Here ``render_html`` is the SERVER side (the
synthetic web exposed over real HTTP as honest HTML documents) and
``parse_html`` is the CLIENT side (executor-local stdlib-HTMLParser walk back
into the span schema). Round-trip identity render→parse == fetch_page is what
makes ``transport=http`` golden-parity-checkable against
``transport=synthetic`` (tests/test_transport.py).

Wire layout: spans live in ``<article>`` as ``<p>/<img>/<video>/<audio>``
elements carrying ``data-offset``; outlinks live in ``<nav>`` as anchors.
Text content is HTML-escaped both ways, so arbitrary span text survives.
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser

from deepcrawl4ai_spark.frontier.webgraph import Page

_MEDIA_TAGS = {"img": "image", "video": "video", "audio": "audio"}


def render_html(page: Page) -> str:
    """Serialize a Page into the HTML wire format (server side)."""
    parts = [
        "<!doctype html>",
        "<html><head><title>"
        + _html.escape(page.url_norm)
        + "</title></head><body><article>",
    ]
    for kind, text, media_ref, offset in page.spans:
        if kind == "text":
            parts.append(f'<p data-offset="{offset}">{_html.escape(text)}</p>')
        elif kind == "image":
            parts.append(
                f'<img data-offset="{offset}" src="{_html.escape(media_ref)}"/>'
            )
        else:  # video | audio share the tag-per-kind layout
            parts.append(
                f'<{kind} data-offset="{offset}" src="{_html.escape(media_ref)}">'
                f"</{kind}>"
            )
    parts.append("</article><nav>")
    for link in page.outlinks:
        esc = _html.escape(link)
        parts.append(f'<a href="{esc}">{esc}</a>')
    parts.append("</nav></body></html>")
    return "\n".join(parts)


class _PageParser(HTMLParser):
    """Single-pass stdlib parse of the wire format back into spans/links."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: list[tuple[str, str, str, int]] = []
        self.links: list[str] = []
        self._in_p_offset: int | None = None
        self._text_buf: list[str] = []

    def handle_starttag(self, tag: str, attrs: list) -> None:
        a = dict(attrs)
        if tag == "p" and "data-offset" in a:
            self._in_p_offset = int(a["data-offset"])
            self._text_buf = []
        elif tag in _MEDIA_TAGS and "data-offset" in a:
            self.spans.append(
                (_MEDIA_TAGS[tag], "", a.get("src", ""), int(a["data-offset"]))
            )
        elif tag == "a" and "href" in a:
            self.links.append(a["href"])

    def handle_data(self, data: str) -> None:
        if self._in_p_offset is not None:
            self._text_buf.append(data)

    def handle_endtag(self, tag: str) -> None:
        if tag == "p" and self._in_p_offset is not None:
            self.spans.append(
                ("text", "".join(self._text_buf), "", self._in_p_offset)
            )
            self._in_p_offset = None


def parse_html(url_norm: str, url_hash: str, html_text: str) -> Page:
    """Parse a wire-format HTML body into a successful Page (client side)."""
    p = _PageParser()
    p.feed(html_text)
    p.close()
    spans = tuple(sorted(p.spans, key=lambda s: s[3]))
    return Page(url_norm, url_hash, "success", spans, tuple(p.links))
