"""C7 selector inference unit tests (reference dynamic_selectors.py:4-48):
the generic stdlib parser must emit the reference's CSS shapes
(tag.cls1.cls2 / tag#id / tag[data-x="v"]) and absolute XPaths built from
each element's OWN ancestor chain, on arbitrary messy HTML — no knowledge
of the span wire layout."""

from __future__ import annotations

from deepcrawl4ai_spark.functions.selectors import auto_detect_selectors

HTML = """
<html><body>
<div class="main content" id="page">
  <p data-role="intro" name="lead">hello</p>
  <img src="x.png" class="hero"/>
  <br>
  <span>plain</span>
</div>
<footer><a href="/next" data-nav="1">next</a></footer>
</body></html>
"""


def test_css_selector_shapes():
    sel = auto_detect_selectors(HTML)
    css = sel["css_selectors"]
    assert css[0] == "html"
    assert css[1] == "body"
    # multi-class joins with dots, id appends with # (reference build_selector)
    assert "div.main.content#page" in css
    assert 'p[data-role="intro"][name="lead"]' in css
    assert "img.hero" in css  # src is NOT an important attribute
    assert "br" in css and "span" in css
    assert 'a[data-nav="1"]' in css  # href is NOT an important attribute


def test_xpath_ancestor_chain():
    sel = auto_detect_selectors(HTML)
    xp = sel["xpath_selectors"]
    # each ancestor carries its OWN predicates (fixes the reference's
    # leaf-attrs-on-every-ancestor walk)
    assert (
        '/html/body/div[contains(@class, "main content")][@id="page"]'
        '/p[@data-role="intro"][@name="lead"]' in xp
    )
    assert "/html/body/footer/a[@data-nav=\"1\"]" in xp
    # void tags (img, br) must not stay on the open stack: span is a child
    # of div, not of br
    assert '/html/body/div[contains(@class, "main content")][@id="page"]/span' in xp


def test_document_order_and_counts():
    sel = auto_detect_selectors(HTML)
    assert len(sel["css_selectors"]) == len(sel["xpath_selectors"]) == 9
    # document order: html, body, div, p, img, br, span, footer, a
    names = [c.split(".")[0].split("#")[0].split("[")[0] for c in sel["css_selectors"]]
    assert names == ["html", "body", "div", "p", "img", "br", "span", "footer", "a"]


def test_unclosed_and_nested_recovery():
    # implicit closes (li without </li>) must not corrupt the ancestor chain
    html = "<ul><li class=a>one<li class=b>two</ul><p>after</p>"
    sel = auto_detect_selectors(html)
    assert sel["css_selectors"] == ["ul", "li.a", "li.b", "p"]
    assert sel["xpath_selectors"][3] == "/p"
    # the second li nests under the first in a naive stack; the end-tag
    # recovery pops to the matching open <ul> so <p> is a root child
    assert sel["xpath_selectors"][2].startswith("/ul/li")
