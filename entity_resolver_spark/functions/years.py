"""Birth/death year extraction from name strings.

Reference parity: /root/reference/src/birth_death_regexes.py:13-166 — a
cascade of regexes covering "1797-1828", "b. 1797", "born 1797", "d. 1828",
"died 1828", "ca./approximately 1797", "fl. 1750" and bare-year forms. Here
the cascade is pure native ``regexp_extract`` ``when`` chains — no Python in
the hot path, fully codegen'd.

Years are 3-4 digit numbers; "fl." (floruit) years are intentionally NOT
treated as birth years, matching the reference's handling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Year with optional uncertainty marker "1797?" (reference accepts it and
# cleans to digits, src/birth_death_regexes.py:28-73,140-166); the capture
# group excludes the "?". 3-4 digits deliberately (the reference allows 2 —
# in transcript text 2-digit numbers are mostly not years).
_Y = r"(\d{3,4})\??"
# All three dash forms the reference accepts: hyphen, en-dash, em-dash.
_D = r"[-–—]"
_CA = r"(?:ca\.?\s*|circa\s*|approximately\s*)"

# Range forms: "1797-1828", "1797 - 1828", "ca. 1797—approximately 1828".
_RANGE = rf"(?:\b{_CA})?{_Y}\s*{_D}\s*(?:{_CA})?{_Y}"
# Open-ended birth: "1797-", "b. 1797", "born ca. 1797".
_BIRTH_OPEN = rf"{_Y}\s*{_D}\s*$"
_BIRTH_MARK = rf"(?:\bb\.?\s*|\bborn\s+)(?:{_CA})?{_Y}"
# Open-ended death: "-1828", "d. 1828", "died approximately 1828".
_DEATH_OPEN = rf"^\s*{_D}\s*(?:{_CA})?{_Y}"
_DEATH_MARK = rf"(?:\bd\.?\s*|\bdied\s+)(?:{_CA})?{_Y}"
# Approximate single year: "ca. 1797", "circa 1797", "approximately 1797".
_APPROX = rf"\b{_CA}{_Y}"


def _to_year(c: Column) -> Column:
    return F.when(c == "", F.lit(None)).otherwise(c).cast("int")


def birth_year_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    rng = _to_year(F.regexp_extract(c, _RANGE, 1))
    mark = _to_year(F.regexp_extract(c, _BIRTH_MARK, 1))
    open_ = _to_year(F.regexp_extract(c, _BIRTH_OPEN, 1))
    # The bare-approx fallback ("circa 1851" -> birth) must not claim a year
    # an explicit death marker owns ("died circa 1851") — the reference
    # checks the b./d. markers before its pattern cascade
    # (src/birth_death_regexes.py:93-107).
    approx = F.when(
        F.regexp_extract(c, _DEATH_MARK, 1) == "",
        _to_year(F.regexp_extract(c, _APPROX, 1)),
    )
    return F.coalesce(rng, mark, open_, approx)


def death_year_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    rng = _to_year(F.regexp_extract(c, _RANGE, 2))
    mark = _to_year(F.regexp_extract(c, _DEATH_MARK, 1))
    open_ = _to_year(F.regexp_extract(c, _DEATH_OPEN, 1))
    return F.coalesce(rng, mark, open_)


def year_match_expr(
    bl: Column, dl: Column, br: Column, dr: Column, tolerance: int = 2
) -> Column:
    """Birth/death agreement feature.

    Semantics mirror the reference's ``birth_death_match``
    (src/feature_engineering.py:1174-1302): when both sides carry both years,
    both must agree within tolerance; single-shared-year cases compare that
    year; when neither side has any year info the feature is 0.0 (the
    reference returns 0.0 despite its docstring, feature_engineering.py:1224).

    DELIBERATE DEVIATION: asymmetric availability (one side has only a birth
    year, the other only a death year) returns neutral 0.5 here, where the
    reference falls through to 0.0. 0.0 would read "years disagree" for pairs
    that merely lack comparable years; the trained weights are fit against
    this 3-level semantics, so behavior is self-consistent.
    """
    tol = F.lit(tolerance)
    both_pairs = bl.isNotNull() & dl.isNotNull() & br.isNotNull() & dr.isNotNull()
    birth_only = bl.isNotNull() & br.isNotNull()
    death_only = dl.isNotNull() & dr.isNotNull()
    none_at_all = bl.isNull() & dl.isNull() & br.isNull() & dr.isNull()
    return (
        F.when(
            both_pairs,
            ((F.abs(bl - br) <= tol) & (F.abs(dl - dr) <= tol)).cast("double"),
        )
        .when(birth_only, (F.abs(bl - br) <= tol).cast("double"))
        .when(death_only, (F.abs(dl - dr) <= tol).cast("double"))
        .when(none_at_all, F.lit(0.0))
        .otherwise(F.lit(0.5))
    )


def year_conflict_expr(
    bl: Column, dl: Column, br: Column, dr: Column, tolerance: int = 2
) -> Column:
    """1.0 iff a year is KNOWN on both sides and disagrees beyond tolerance.

    Complements ``year_match_expr``, whose reference-parity semantics return
    0.0 both for "no year info" and never isolate a positive contradiction —
    so a linear scorer can't use it to split same-name confounders
    ("Schubert the composer, 1797-1828" vs "Schubert the archaeologist,
    1836-1911"). This is a new discriminative feature, not in the reference.
    """
    tol = F.lit(tolerance)
    birth_conflict = bl.isNotNull() & br.isNotNull() & (F.abs(bl - br) > tol)
    death_conflict = dl.isNotNull() & dr.isNotNull() & (F.abs(dl - dr) > tol)
    return (birth_conflict | death_conflict).cast("double")
