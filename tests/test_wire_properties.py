"""Property tests for the wire formats: htmlpage render→parse must be the
identity on ARBITRARY span documents (not just webgraph's), and the robots
render→parse round-trip must preserve any rule set — the losslessness the
transport golden tests rely on, pushed through hypothesis."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from deepcrawl4ai_spark.frontier.htmlpage import parse_html, render_html
from deepcrawl4ai_spark.frontier.webgraph import Page
from deepcrawl4ai_spark.functions.robots import (
    parse_robots_txt,
    render_robots_txt,
)

# span text: any printable unicode incl. HTML-dangerous chars; no control
# chars (a real extractor strips them before storage)
_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cc", "Cs"), min_codepoint=32
    ),
    max_size=80,
)
_media_ref = st.from_regex(r"media://[a-z0-9]{4,12}/[a-z0-9]{1,8}", fullmatch=True)
_url = st.from_regex(r"https://[a-z]{3,10}\.example\.com/p/[0-9]{1,6}", fullmatch=True)


@st.composite
def _spans(draw):
    kinds = draw(
        st.lists(
            st.sampled_from(["text", "image", "video", "audio"]), max_size=12
        )
    )
    out = []
    for off, kind in enumerate(kinds):
        if kind == "text":
            out.append((kind, draw(_text), "", off))
        else:
            out.append((kind, "", draw(_media_ref), off))
    return tuple(out)


@settings(max_examples=150, deadline=None)
@given(spans=_spans(), links=st.lists(_url, max_size=8))
def test_html_roundtrip_arbitrary_documents(spans, links):
    page = Page("https://h.example.com/p/1", "ab" * 20, "success", spans, tuple(links))
    back = parse_html(page.url_norm, page.url_hash, render_html(page))
    assert back.spans == page.spans
    assert back.outlinks == page.outlinks


_rule = st.from_regex(r"/[a-zA-Z0-9/_.-]{0,20}(\*[a-zA-Z0-9/.-]{0,8})?(\$)?", fullmatch=True)


@settings(max_examples=150, deadline=None)
@given(
    rules=st.lists(_rule, max_size=6),
    delay=st.one_of(st.none(), st.floats(0.1, 60).map(lambda x: round(x, 2))),
)
def test_robots_roundtrip_arbitrary_rules(rules, delay):
    row = {"disallow_rules": rules, "crawl_delay": delay}
    parsed = parse_robots_txt(render_robots_txt(row), "deepcrawl4ai")
    assert parsed["disallow"] == rules
    assert parsed["crawl_delay"] == delay
    # the decoy group in the rendered body must never leak into our group
    assert "/" not in parsed["disallow"] or "/" in rules
