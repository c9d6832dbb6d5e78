"""Property-based checks (hypothesis) for the pure-python/numpy kernels.

These run WITHOUT Spark: the batch Jaro-Winkler kernel must agree with the
scalar reference implementation on arbitrary inputs (the scalar is itself
DuckDB-verified in test_similarity), and the year-regex cascade must
round-trip generated name decorations.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolver_spark.functions.similarity import (
    jaro_winkler,
    jaro_winkler_batch,
)

# printable-ish text incl. spaces, accents, punctuation — no NUL (batch
# kernel's documented exclusion)
_text = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
    min_size=0,
    max_size=40,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(_text, _text), min_size=1, max_size=50))
def test_jw_batch_matches_scalar(pairs):
    av = np.array([p[0] for p in pairs], dtype=object)
    bv = np.array([p[1] for p in pairs], dtype=object)
    got = jaro_winkler_batch(av, bv)
    for i, (a, b) in enumerate(pairs):
        exp = jaro_winkler(a, b)
        assert abs(got[i] - exp) <= 1e-12, (a, b, got[i], exp)


@settings(max_examples=200, deadline=None)
@given(_text, _text)
def test_jw_scalar_properties(a, b):
    v = jaro_winkler(a, b)
    assert 0.0 <= v <= 1.0
    assert jaro_winkler(b, a) == v  # symmetry
    assert jaro_winkler(a, a) == 1.0
