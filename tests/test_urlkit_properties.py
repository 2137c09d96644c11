"""Property-based tests (hypothesis) for the urlkit kernels.

The golden corpus in test_urlkit.py pins the reference's unit-spec
cases; these properties pin the *algebra* every downstream identity
depends on, over generated adversarial inputs:

  * canonicalization is idempotent (a seen-set key re-canonicalized is
    itself — otherwise the D1 anti-join would leak re-queued urls);
  * the node_href fast path (_CANONICAL_RE acceptance) agrees with the
    full parser (a fast-path/slow-path split that disagrees is a
    correctness bug, not a perf optimization);
  * resolve output is already canonical (queued urls never need a
    second normalization);
  * resolve_many (the origin fast path used by the fused Arrow kernel)
    equals element-wise node_resolve;
  * strip_fragment drops everything from '#' and is idempotent (the P2
    Page-ctor asymmetry rides on this).

Failing examples found here should be added to the test_urlkit corpus.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from node_crawler_spark.functions.urlkit import (
    node_href,
    node_parse,
    node_resolve,
    resolve_many,
    strip_fragment,
)

# --- input strategies -------------------------------------------------------

_SCHEMES = st.sampled_from(
    ["http://", "https://", "HTTP://", "HtTpS://", "ftp://", "ws://",
     "mailto:", "javascript:", "tel:", ""]
)
_HOST_CHARS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.-",
    min_size=0, max_size=12,
)
_PORT = st.sampled_from(["", ":80", ":8080", ":0", ":"])
_AUTH = st.sampled_from(["", "user@", "user:pw@", "a:b:c@"])
# path/query/fragment chars include the Node autoEscape set and spaces
_REST = st.text(
    alphabet="abcXYZ019/.-_~%?#=&'\"<>`{}|\\^ \t",
    min_size=0, max_size=16,
)


@st.composite
def urlish(draw) -> str:
    return (
        draw(_SCHEMES) + draw(_AUTH) + draw(_HOST_CHARS) + draw(_PORT)
        + draw(_REST)
    )


_HREFS = st.lists(
    st.one_of(
        urlish(),
        st.sampled_from(
            ["/abs", "sibling", "../up", "section/", "", "#frag",
             "?q=1", "//proto-rel.test/x", "/a b", "mailto:x@y.z"]
        ),
    ),
    max_size=6,
)


# --- properties -------------------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(urlish())
def test_node_href_idempotent(u):
    once = node_href(u)
    assert node_href(once) == once


@settings(max_examples=300, deadline=None)
@given(urlish())
def test_parse_href_roundtrip_stable(u):
    """parse(parse(u).href).href == parse(u).href — href is a fixpoint
    of the parser itself (stronger than node_href idempotence: no fast
    path involved)."""
    once = node_parse(u)["href"]
    assert node_parse(once)["href"] == once


@settings(max_examples=300, deadline=None)
@given(urlish())
def test_fast_path_agrees_with_parser(u):
    """Whenever the _CANONICAL_RE fast path accepts a url verbatim, the
    full parser must reproduce it byte-for-byte."""
    from node_crawler_spark.functions.urlkit import _CANONICAL_RE

    s = str(u)
    if _CANONICAL_RE.match(s):
        assert node_parse(s)["href"] == s


@settings(max_examples=200, deadline=None)
@given(urlish(), urlish())
def test_resolve_output_is_canonical(base, href):
    r = node_resolve(base, href)
    assert node_href(r) == r


@settings(max_examples=200, deadline=None)
@given(urlish(), _HREFS)
def test_resolve_many_matches_elementwise(base, hrefs):
    assert resolve_many(base, hrefs) == [
        node_resolve(base, h) for h in hrefs
    ]


@settings(max_examples=300, deadline=None)
@given(urlish())
def test_strip_fragment_properties(u):
    s = strip_fragment(u)
    assert "#" not in s
    assert strip_fragment(s) == s
    if "#" not in str(u):
        assert s == str(u)
