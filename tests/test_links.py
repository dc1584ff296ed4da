"""Outlink extraction + resolution (frontier/links.py).

Three independent anchors:
- the Spark Column pipeline equals the pure-python mirror,
- the mirror equals urllib.parse.urljoin across the documented
  envelope (hypothesis),
- the registry queries compose it end-to-end (oracle-checked by
  tools/check_oracles.py; here we pin plan hygiene: no Python eval
  in the pipeline).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from hypothesis import given, settings
from hypothesis import strategies as st

from edgar_crawler_spark.frontier.links import (
    HREF_RE,
    extract_hrefs_py,
    outlink_edges,
    resolve_link_py,
)

BASE = "https://src0.example.com/d3/p27/page.html"

CASES = [
    "https://ext.org/x/y",
    "/r/a.html",
    "../u/t",
    "./s/t?b=2&a=1",
    "//cdn.example.net/c/z",
    "a/b/../c",
    "../../up2",
    "../../../clamped",
    "?q=1",
    "sub/",
    "/a/./b/../c/d",
    "x/./y",
]
DROPPED = ["", "#top", "mailto:x@y", "javascript:void(0)", "tel:123",
           "DATA:text/plain,x", "  "]


class TestResolveMirror:
    def test_cases_match_urljoin(self):
        for link in CASES:
            assert resolve_link_py(BASE, link) == urljoin(BASE, link), link

    def test_dropped_links(self):
        for link in DROPPED:
            assert resolve_link_py(BASE, link) is None, repr(link)

    def test_scheme_case_preserved_until_canon(self):
        # urljoin lowercases an absolute link's scheme itself; this
        # resolver leaves it to canonicalize_url (which also folds the
        # host), so resolution stays a pure reference-merge
        from edgar_crawler_spark.frontier.canon import canonicalize_url_py

        got = resolve_link_py(BASE, "HTTPS://UP.org/q")
        assert got == "HTTPS://UP.org/q"
        assert canonicalize_url_py(got) == "https://up.org/q"

    def test_extract_hrefs_order_and_quoting(self):
        html = (
            '<p><a href="x">1</a><A HREF=\'y\'>2</a>'
            '<a class="z" href="w">3</a><a nohref>4</a></p>'
        )
        assert extract_hrefs_py(html) == ["x", "y", "w"]

    def test_extract_anchors_pairs(self):
        from edgar_crawler_spark.frontier.links import extract_anchors_py

        html = (
            '<a href="x">first link</a> text '
            "<A HREF='y' rel=\"nofollow\">second</a>"
        )
        assert extract_anchors_py(html) == [
            ("x", "first link"), ("y", "second"),
        ]


# envelope: lowercase path segments, optional interleaved ./ and up to
# 4 ../ segments, optional query string — what real crawl html uses
# and what the bounded regex passes guarantee on both engines.
class TestRegDomain:
    CASES = {
        "www.foo.example.com": "example.com",
        "foo.co.uk": "foo.co.uk",
        "a.b.shop.co.uk": "shop.co.uk",
        "h1.ex2.com.au": "ex2.com.au",
        "EXAMPLE.ORG:8080": "example.org",
        "sec.gov": "sec.gov",
        "deep.sub.tree.example.net": "example.net",
        "localhost": "localhost",  # no dot: pass through
    }

    def test_cases_py(self):
        from edgar_crawler_spark.frontier.canon import reg_domain_py

        for host, want in self.CASES.items():
            assert reg_domain_py(host) == want, host

    def test_spark_equals_mirror(self, spark):
        from edgar_crawler_spark.frontier.canon import (
            reg_domain_col,
            reg_domain_py,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(h,) for h in self.CASES], "host string"
        )
        got = {
            r.host: r.d
            for r in df.select(
                "host", reg_domain_col("host").alias("d")
            ).collect()
        }
        for h in self.CASES:
            assert got[h] == reg_domain_py(h), h
        plan = (
            df.select(reg_domain_col("host"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan


_seg = st.from_regex(r"[a-z][a-z0-9]{0,5}", fullmatch=True)
_dots = st.sampled_from([".", ".."])
_rel_path = st.lists(
    st.one_of(_seg, _dots), min_size=1, max_size=6
).filter(lambda segs: sum(s == ".." for s in segs) <= 4).map("/".join)
_query = st.one_of(st.just(""), st.just("?a=1&b=2"))


class TestResolveProperties:
    @given(
        st.lists(_seg, min_size=0, max_size=3),  # base dir depth
        st.booleans(),                            # base ends in file?
        _rel_path,
        _query,
        st.sampled_from(["", "/", "//h.example.net/", "https://abs.org/"]),
    )
    @settings(max_examples=300, deadline=None)
    def test_matches_urljoin_in_envelope(self, bdirs, bfile, rel, q, prefix):
        base = "https://h0.example.com/" + "/".join(bdirs)
        if bdirs:
            base += "/"
        if bfile:
            base += "leaf.html"
        link = prefix + rel + q
        if link == "" or link.startswith("#"):
            return
        if prefix not in ("", "/") and ("/./" in f"/{rel}/" or "/../" in f"/{rel}/"):
            # CPython urljoin skips RFC 3986 §5.2.2 dot-segment
            # removal for references that carry their own authority
            # (absolute / network-path); this resolver applies it.
            return
        assert resolve_link_py(base, link) == urljoin(base, link), (
            base, link)

    @given(_rel_path, _query)
    @settings(max_examples=100, deadline=None)
    def test_deterministic_and_fragmentless(self, rel, q):
        r1 = resolve_link_py(BASE, rel + q)
        assert r1 == resolve_link_py(BASE, rel + q)
        assert r1 is not None and "#" not in r1


class TestSparkPipeline:
    def test_spark_equals_mirror_and_no_python_eval(self, spark):
        html = "".join(f'<a href="{link}">x</a>' for link in CASES + DROPPED)
        df = spark.createDataFrame(
            [(BASE, html)], "url string, html string"
        )
        edges = outlink_edges(df)
        want = [
            resolve_link_py(BASE, link)
            for link in extract_hrefs_py(html)
        ]
        want = [w for w in want if w is not None]
        got = [r.dst for r in edges.collect()]
        # canonicalization lowercases the HTTPS://UP.org scheme+host
        from edgar_crawler_spark.frontier.canon import canonicalize_url_py

        assert got == [canonicalize_url_py(w) for w in want]
        plan = edges._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_extract_anchors_spark_equals_mirror(self, spark):
        from edgar_crawler_spark.frontier.links import (
            extract_anchors,
            extract_anchors_py,
        )

        html = (
            '<a href="/a">alpha beta</a><A HREF=\'b/c\'>gamma</a>'
            '<a href="#f">frag</a>'
        )
        df = spark.createDataFrame([(html,)], "html string")
        [row] = df.select(extract_anchors("html").alias("a")).collect()
        got = [(x.href, x.anchor) for x in row.a]
        assert got == extract_anchors_py(html)

    def test_binary_html_column(self, spark):
        df = spark.createDataFrame(
            [(BASE, bytearray(b'<a href="/bin/x">b</a>'))],
            "url string, html binary",
        )
        got = [r.dst for r in outlink_edges(df).collect()]
        assert got == ["https://src0.example.com/bin/x"]

    def test_sitemap_locs_spark_equals_mirror(self, spark):
        from edgar_crawler_spark.frontier.links import (
            extract_sitemap_locs,
            extract_sitemap_locs_py,
        )

        xml = (
            "<urlset><url><loc>\n https://a.com/x \n</loc></url>"
            "<url><LOC>https://b.net/y</LOC></url>"
            "<url><Loc>  https://c.org/z</Loc></url></urlset>"
        )
        df = spark.createDataFrame([(xml,)], "xml string")
        [row] = df.select(extract_sitemap_locs("xml").alias("l")).collect()
        want = ["https://a.com/x", "https://b.net/y", "https://c.org/z"]
        assert list(row.l) == want
        assert extract_sitemap_locs_py(xml) == want

    def test_href_re_is_re2_safe_for_duckdb(self):
        import duckdb

        con = duckdb.connect()
        html = '<a href="x">1</a><A HREF=\'y\'>2</a>'
        out = con.execute(
            "SELECT regexp_extract_all(?, ?, 1)", [html, HREF_RE]
        ).fetchone()[0]
        assert out == ["x", "y"]


def _rfc_remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 reference algorithm, implemented independently
    of the operator's regex passes (the test oracle for
    authority-carrying references, where CPython's urljoin skips
    normalization but browsers/WHATWG and this resolver apply it)."""
    out: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if out:
                out.pop()
        elif buf == "/..":
            buf = "/"
            if out:
                out.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            m = re.match(r"^/?[^/]*", buf)
            seg = m.group(0)
            out.append(seg)
            buf = buf[len(seg):]
    return "".join(out)


class TestAuthorityDotSegments:
    """Review finding (round 4): dot-segment removal used to run over
    scheme://host, so 'https://h/../a' resolved to 'https://a' — a
    wrong-host frontier URL. Pins: the authority is inviolable and
    the path normalizes per RFC 3986 §5.2.4 (browser behavior; the
    envelope note in test_matches_urljoin_in_envelope documents the
    deliberate divergence from CPython urljoin here)."""

    @given(_rel_path, _query, st.booleans())
    @settings(max_examples=300, deadline=None)
    def test_rfc_strict_path_host_inviolable(self, rel, q, protorel):
        path = "/" + rel
        url = ("//" if protorel else "https://") + "keep.example.org" + path + q
        got = resolve_link_py(BASE, url)
        want = "https://keep.example.org" + _rfc_remove_dot_segments(path) + q
        assert got == want, (url, got, want)
        assert got.split("//", 1)[1].split("/", 1)[0] == "keep.example.org"

    def test_review_repros(self):
        assert resolve_link_py(BASE, "https://abs.org/../a") == "https://abs.org/a"
        assert (
            resolve_link_py(BASE, "//h.example.net/../x")
            == "https://h.example.net/x"
        )
        assert (
            resolve_link_py(BASE, "http://example.com/../../a")
            == "http://example.com/a"
        )


class TestHrefAttributeBoundary:
    """Review finding (round 4): [^>]*? could stop inside an attribute
    NAME, so data-href/xlink:href values were extracted as the link
    and the tag's real href was dropped."""

    def test_data_href_never_matches(self):
        assert extract_hrefs_py('<a data-href="no" href="yes">t</a>') == ["yes"]
        assert extract_hrefs_py('<a xlink:href="no" href="yes">t</a>') == ["yes"]
        assert extract_hrefs_py('<a data-href="only">t</a>') == []
        assert extract_hrefs_py('<a href="h1">a</a><a class="c" href="h2">b</a>') == [
            "h1", "h2",
        ]
        from edgar_crawler_spark.frontier.links import extract_anchors_py

        assert extract_anchors_py('<a data-href="no" href="yes">t</a>') == [
            ("yes", "t")
        ]
