"""Generic CSS/XPath selector inference from HTML — the true C7 operator
(reference dynamic_selectors.py:4-48 ``auto_detect_selectors``): for every
element in a document, a CSS selector built from its tag plus its
class / id / name / data-* attributes, and an absolute XPath through its
ancestor chain.

stdlib ``html.parser`` stands in for bs4 (not in this sandbox). Two
deliberate corrections vs the reference implementation, noted so parity
checks don't chase them: (1) each ancestor's XPath predicates come from that
ancestor's OWN attributes — the reference re-applies the leaf tag's attrs to
every ancestor in its parent walk; (2) the XPath class predicate uses the
class string itself, not bs4's list repr.
"""

from __future__ import annotations

from html.parser import HTMLParser

IMPORTANT_ATTRIBUTES = ("class", "id", "name")

# elements that never take a closing tag — pop them immediately
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta source track wbr".split()
)


def _selected_attrs(attrs: list) -> list[tuple[str, str]]:
    """Attributes that contribute to selectors, in document order."""
    return [
        (a, v if v is not None else "")
        for a, v in attrs
        if a in IMPORTANT_ATTRIBUTES or a.startswith("data-")
    ]


def css_part(tag: str, attrs: list) -> str:
    sel = tag
    for attr, value in _selected_attrs(attrs):
        if attr == "class":
            sel += "." + ".".join(value.split())
        elif attr == "id":
            sel += f"#{value}"
        else:
            sel += f'[{attr}="{value}"]'
    return sel


def xpath_part(tag: str, attrs: list) -> str:
    part = tag
    for attr, value in _selected_attrs(attrs):
        if attr == "class":
            part += f'[contains(@class, "{value}")]'
        elif attr == "id":
            part += f'[@id="{value}"]'
        else:
            part += f'[@{attr}="{value}"]'
    return part


class _SelectorParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._stack: list[tuple[str, str]] = []  # (tag, xpath part) open chain
        self.css_selectors: list[str] = []
        self.xpath_selectors: list[str] = []

    def _emit(self, tag: str, attrs: list, self_closing: bool) -> None:
        self._stack.append((tag, xpath_part(tag, attrs)))
        self.css_selectors.append(css_part(tag, attrs))
        self.xpath_selectors.append(
            "/" + "/".join(part for _t, part in self._stack)
        )
        if self_closing or tag in VOID_TAGS:
            self._stack.pop()

    def handle_starttag(self, tag: str, attrs: list) -> None:
        self._emit(tag, attrs, self_closing=False)

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        self._emit(tag, attrs, self_closing=True)

    def handle_endtag(self, tag: str) -> None:
        # pop to the matching open tag; tolerates implicitly-closed children
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                del self._stack[i:]
                return


def auto_detect_selectors(html: str) -> dict[str, list[str]]:
    """One CSS selector + one absolute XPath per element, in document order —
    the reference's return shape (dynamic_selectors.py:48)."""
    p = _SelectorParser()
    p.feed(html)
    p.close()
    return {"css_selectors": p.css_selectors, "xpath_selectors": p.xpath_selectors}
