"""Property-based tests (hypothesis) for the pure text functions — the
invariants that hold for ALL inputs, not just the curated fixtures."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from reading_the_unreadable_spark.functions.text import (
    is_title_pd,
    knit_string_list,
    knit_strings,
    normalize_text_pd,
    strip_fences_pd,
)

# text alphabet including the OCR specials the normalizer handles
TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcdefgzABCZ .,!?\n-") + ["ﬁ", "ﬂ", "ſ", " ", "\t"]
    ),
    max_size=80,
)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_normalize_idempotent(s):
    once = normalize_text_pd(pd.Series([s])).iloc[0]
    twice = normalize_text_pd(pd.Series([once])).iloc[0]
    assert once == twice


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_normalize_output_clean(s):
    out = normalize_text_pd(pd.Series([s])).iloc[0]
    # no ligatures survive, no lone \n, no double spaces, no edge whitespace
    assert not any(lig in out for lig in ("ﬁ", "ﬂ", "ﬀ", "ﬃ", "ﬄ", "ſ"))
    assert "  " not in out
    assert out == out.strip()
    for chunk in out.split("\n\n"):
        assert "\n" not in chunk


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_knit_boundary_properties(a, b):
    out = knit_strings(a, b)
    if not a:
        assert out == b
    elif not b:
        assert out == a
    else:
        # the knit never loses the head of a or the tail of b
        assert out.startswith(a[:1])
        assert out.endswith(b[-1:])
        assert len(out) <= len(a) + len(b)


@settings(max_examples=100, deadline=None)
@given(st.lists(TEXT, max_size=5))
def test_knit_list_total(texts):
    out = knit_string_list(texts)
    assert isinstance(out, str)
    if texts and all(texts):
        assert len(out) <= sum(len(t) for t in texts)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_title_requires_uppercase(s):
    if is_title_pd(pd.Series([s])).iloc[0]:
        assert s == s.upper()
        assert sum(c.isalpha() and c.isupper() for c in s) >= 5


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_strip_fences_removes_fences(s):
    out = strip_fences_pd(pd.Series([s])).iloc[0]
    assert not out.startswith("`") and not out.endswith("`")
