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


def _kmv_reference(a, b, k):
    """Independent scalar KMV bottom-k Jaccard estimator: u = min(k, |A∪B|),
    tau = u-th smallest distinct union value, estimate = |{v ∈ A∩B : v ≤
    tau}| / u. Mirrors the definition in similarity.make_kmv_jaccard_pudf's
    docstring without sharing any of its matrix mechanics."""
    if a is None or b is None:
        return None
    union = sorted(set(a) | set(b))
    u = min(k, len(union))
    if u == 0:
        return 0.0
    tau = union[u - 1]
    shared = sum(1 for v in set(a) & set(b) if v <= tau)
    return shared / u


# Per-side-distinct int32 values below the kernel's int32-max padding
# sentinel — both invariants hold for real sketches (kmv_sketch_expr stores
# distinct 31-bit hash values, so max is 2^31 - 1 only with probability
# ~2^-31 per value).
def _sketch(k):
    return st.lists(
        st.integers(min_value=-(2**31), max_value=2**31 - 2),
        min_size=0,
        max_size=k,
        unique=True,
    )


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_kmv_kernel_matches_reference(data):
    import pandas as pd

    from entity_resolver_spark.functions.similarity import make_kmv_jaccard_pudf

    k = data.draw(st.integers(min_value=1, max_value=16), label="k")
    rows = data.draw(
        st.lists(
            st.tuples(
                st.one_of(st.none(), _sketch(k)),
                st.one_of(st.none(), _sketch(k)),
            ),
            min_size=1,
            max_size=20,
        ),
        label="rows",
    )
    kernel = make_kmv_jaccard_pudf(k).func  # unwrap: run batch fn JVM-free
    to_cell = lambda v: None if v is None else np.asarray(sorted(v), np.int32)
    got = kernel(
        pd.Series([to_cell(a) for a, _ in rows], dtype=object),
        pd.Series([to_cell(b) for _, b in rows], dtype=object),
    )
    for i, (a, b) in enumerate(rows):
        exp = _kmv_reference(a, b, k)
        if exp is None:
            assert np.isnan(got[i]), (i, a, b, got[i])
        else:
            assert abs(got[i] - exp) <= 1e-12, (i, a, b, got[i], exp)
