"""P5: the real HTML parse stage. Messy, non-regular tag soup must
parse into correct links/fields ('' defaults), and on the regular
synthetic corpus the parser-backed stages must be byte-identical to the
regex fast path (the documented swap point)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from pyspider_spark import htmlparse as H
from pyspider_spark import stages
from pyspider_spark.loop import CrawlEngine
from pyspider_spark.schemas import IMAGES, ITEMS, METRICS, SEEN
from pyspider_spark.synth import GraphSpec

MESSY = """
<HTML><body>
  <P>unclosed paragraph
  <div class="a-section a-spacing-medium" data-x=1>
    <ul><li>one<li>two<li><A HREF='/rel/one'>link1</a>
    <img src=/img/a.png alt="first">
    <span class="a-icon-alt">4.5 stars</span>
  </div>
  <div class='a-section'>
    <a href="https://x.example/two?b=2&a=1">link2</a>
    <span class="a-offscreen">$9.99</span>
    <br><hr>
  </div>
  <!-- <a href="/in/comment">nope</a// -->
  <table><tr><td>c1<td>c2<tr><td>c3</table>
  <a name="anchor-no-href">text</a>
  <img src="/img/b.png">
</body>
"""


def test_messy_links_in_document_order():
    links = H.links_batch(pd.Series([MESSY]))[0]
    assert links == [
        "/rel/one",
        "https://x.example/two?b=2&a=1",
        "/img/a.png",
        "/img/b.png",
    ]


def test_class_attr_matching_bs4_semantics():
    root = H.parse_html(MESSY)
    # multi-class query matches the element carrying both classes
    both = root.find_all("div", {"class": "a-section a-spacing-medium"})
    assert len(both) == 1 and both[0].get("data-x") == "1"
    # single-class query matches every element containing it
    assert len(root.find_all("div", {"class": "a-section"})) == 2


def test_parent_chain_and_string():
    root = H.parse_html(MESSY)
    star = root.find("span", {"class": "a-icon-alt"})
    assert star.string == "4.5 stars"
    # the unclosed <ul>/<li> keep the span nested (HTML5 behavior);
    # the goods container is further up the parent chain
    chain = []
    n = star.parent
    while n is not None:
        chain.append(n)
        n = n.parent
    div = next(x for x in chain if x.tag == "div")
    assert "a-spacing-medium" in div.get("class")


def test_implicit_close_tag_soup():
    root = H.parse_html(MESSY)
    lis = root.find_all("li")
    assert len(lis) == 3  # <li> soup closed implicitly, not nested
    tds = root.find_all("td")
    assert [t.string for t in tds] == ["c1", "c2", "c3"]


def test_fields_batch_empty_defaults():
    spec = [
        ("price", "span", {"class": "a-offscreen"}, "text"),
        ("missing", "span", {"class": "nope"}, "text"),
        ("img", "img", None, "@src"),
        ("badattr", "img", None, "@data-nope"),
    ]
    out = H.fields_batch(pd.Series([MESSY, "<p>nothing here</p>", None]), spec)
    assert out.iloc[0].tolist() == ["$9.99", "", "/img/a.png", ""]
    assert out.iloc[1].tolist() == ["", "", "", ""]
    assert out.iloc[2].tolist() == ["", "", "", ""]


def test_never_raises_on_garbage():
    garbage = pd.Series(["<<<>>>", "<a href=", "\x00\x01", "", None, "<a "])
    out = H.links_batch(garbage)
    assert all(isinstance(v, list) for v in out)


# ---------------------------------------------------- engine equivalence

SPEC = GraphSpec(n_hosts=2, chains_per_host=2, seed_tag="html1")


def digest(eng, name, schema):
    df = eng.store.read_or_empty(name, schema)
    rows = sorted(repr(sorted(r.asDict().items())) for r in df.collect())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def test_html_parser_engine_byte_identical(spark, tmp_path_factory):
    """Full crawl with the real HTML parser swapped in produces
    byte-identical outputs on the synthetic corpus."""
    wd_a = str(tmp_path_factory.mktemp("regex"))
    a = CrawlEngine(spark, wd_a, SPEC, n_seen_partitions=4)
    a.run(max_rounds=3)
    wd_b = str(tmp_path_factory.mktemp("htmlp"))
    b = CrawlEngine(spark, wd_b, SPEC, n_seen_partitions=4, html_parser=True)
    b.run(max_rounds=3)
    for t, s in [("seen", SEEN), ("items", ITEMS), ("images", IMAGES), ("metrics", METRICS)]:
        assert digest(a, t, s) == digest(b, t, s), t
