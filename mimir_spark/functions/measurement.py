"""Measurement-spec rewrite: unit-normalized range predicates.

Re-expression of the reference's measurements helper, which parses
"30 cm" / "1 to 3 feet" specs, normalizes units via a GNU-Units-style
parser, and rewrites them to disjunctions of range constraints over
normalized value/unit columns with interval-overlap semantics
(plugins/measurements/.../MeasurementAnnotationHelper.java:238-377,
381-418). Here the rewrite is a pre-plan Python function producing a
plain Column predicate — no Catalyst rule needed (SURVEY.md §4.1):
Catalyst then pushes the resulting ranges into the scan.

Round 4 widened the unit grammar toward the reference parser's
breadth: a small dimensional algebra over the SI base (m, kg, s) with
- derived/compound units: "m/s", "km/h", "kg per m^3", "mph";
- area/volume words and powers: "square feet", "sq ft", "cubic
  metres", "m^2", "ft3", "litres", "gallons", "acres", "hectares";
- dimension-aware normalization: every unit reduces to a canonical
  dimension signature ("m", "m^2", "m^3", "m s^-1", ...), so a spec
  can only ever match rows of the same physical dimension, and
  unknown or malformed units are rejected loudly.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# primitive vocabulary: name -> (factor to SI, dimension exponents
# over (metre, kilogram, second)). Multi-word forms are handled by the
# parser (square/cubic modifiers, "/" and "per" compounds, ^n powers).
_UNITS: dict[str, tuple[float, tuple[int, int, int]]] = {
    # length -> metre
    "m": (1.0, (1, 0, 0)), "metre": (1.0, (1, 0, 0)),
    "meter": (1.0, (1, 0, 0)),
    "cm": (0.01, (1, 0, 0)), "mm": (0.001, (1, 0, 0)),
    "km": (1000.0, (1, 0, 0)),
    "in": (0.0254, (1, 0, 0)), "inch": (0.0254, (1, 0, 0)),
    "inches": (0.0254, (1, 0, 0)),
    "ft": (0.3048, (1, 0, 0)), "foot": (0.3048, (1, 0, 0)),
    "feet": (0.3048, (1, 0, 0)),
    "yd": (0.9144, (1, 0, 0)), "yard": (0.9144, (1, 0, 0)),
    "mi": (1609.344, (1, 0, 0)), "mile": (1609.344, (1, 0, 0)),
    # mass -> kilogram
    "kg": (1.0, (0, 1, 0)), "kilogram": (1.0, (0, 1, 0)),
    "g": (0.001, (0, 1, 0)), "gram": (0.001, (0, 1, 0)),
    "mg": (1e-6, (0, 1, 0)),
    "t": (1000.0, (0, 1, 0)), "tonne": (1000.0, (0, 1, 0)),
    "lb": (0.45359237, (0, 1, 0)), "lbs": (0.45359237, (0, 1, 0)),
    "pound": (0.45359237, (0, 1, 0)),
    "oz": (0.028349523125, (0, 1, 0)), "ounce": (0.028349523125, (0, 1, 0)),
    # time -> second
    "s": (1.0, (0, 0, 1)), "sec": (1.0, (0, 0, 1)),
    "second": (1.0, (0, 0, 1)),
    "min": (60.0, (0, 0, 1)), "minute": (60.0, (0, 0, 1)),
    "h": (3600.0, (0, 0, 1)), "hr": (3600.0, (0, 0, 1)),
    "hour": (3600.0, (0, 0, 1)),
    "day": (86400.0, (0, 0, 1)), "week": (604800.0, (0, 0, 1)),
    "ms": (0.001, (0, 0, 1)), "us": (1e-6, (0, 0, 1)),
    # named areas -> m^2
    "acre": (4046.8564224, (2, 0, 0)), "hectare": (10000.0, (2, 0, 0)),
    "ha": (10000.0, (2, 0, 0)),
    # named volumes -> m^3
    "l": (0.001, (3, 0, 0)), "litre": (0.001, (3, 0, 0)),
    "liter": (0.001, (3, 0, 0)), "ml": (1e-6, (3, 0, 0)),
    "gallon": (0.003785411784, (3, 0, 0)),
    "gal": (0.003785411784, (3, 0, 0)),
    "pint": (0.000473176473, (3, 0, 0)),
    # named speeds -> m/s
    "mph": (0.44704, (1, 0, -1)), "knot": (0.51444444444444444, (1, 0, -1)),
}

_POW_WORDS = {"square": 2, "sq": 2, "cubic": 3, "cu": 3}
_DIM_NAMES = ("m", "kg", "s")

_TOKEN_RE = re.compile(r"^([a-z]+)(?:\^(-?\d+)|([23]))?$")


def _singular(name: str) -> str:
    if name in _UNITS:
        return name
    if len(name) > 2 and name.endswith("s") and name[:-1] in _UNITS:
        return name[:-1]
    return name


def parse_unit(unit_str: str) -> tuple[tuple[int, int, int], float]:
    """Unit expression -> (dimension exponents over (m, kg, s), factor
    to SI). Grammar: words separated by spaces; "square"/"sq"/"cubic"/
    "cu" raise the next unit's power; "name^n" / "name2" / "name3"
    inline powers; "/" or "per" flips following terms into the
    denominator. Unknown units raise ValueError (dimension-aware
    rejection — the reference parser's null-Measurement branch,
    MeasurementAnnotationHelper.java:288-292)."""
    s = unit_str.lower().strip()
    s = s.replace("²", "^2").replace("³", "^3")
    s = re.sub(r"\s*/\s*", " / ", s)
    tokens = s.split()
    if not tokens:
        raise ValueError("empty unit in measurement spec")
    sign, pending_pow = 1, 1
    dim = [0, 0, 0]
    factor = 1.0
    saw_unit = False
    for tok in tokens:
        if tok in ("/", "per"):
            if not saw_unit:
                raise ValueError(f"misplaced divider in unit {unit_str!r}")
            sign = -1
            continue
        if tok in _POW_WORDS:
            pending_pow = _POW_WORDS[tok]
            continue
        m = _TOKEN_RE.match(tok)
        if not m:
            raise ValueError(f"unparseable unit token {tok!r} in {unit_str!r}")
        name, p_caret, p_digit = m.groups()
        power = int(p_caret) if p_caret else (int(p_digit) if p_digit else 1)
        power *= pending_pow
        pending_pow = 1
        name = _singular(name)
        if name not in _UNITS:
            raise ValueError(f"unknown unit {tok!r} in {unit_str!r}")
        f, d = _UNITS[name]
        factor *= f ** (sign * power)
        for j in range(3):
            dim[j] += sign * power * d[j]
        saw_unit = True
    if not saw_unit:
        raise ValueError(f"no unit in {unit_str!r}")
    if pending_pow != 1:
        raise ValueError(f"dangling power word in {unit_str!r}")
    return tuple(dim), factor


def dimension_signature(dim: tuple[int, int, int]) -> str:
    """Canonical dimension string: 'm', 'kg', 'm^2', 'm^3',
    'm s^-1', 'kg m^-3', ... — the normalized_unit vocabulary. Base
    order: length, mass, time, with negative exponents last-ish via
    the fixed (m, kg, s) order."""
    named = [(n, e) for n, e in zip(_DIM_NAMES, dim) if e != 0]
    if not named:
        raise ValueError("dimensionless measurement")
    # positive exponents first (numerator), then negative, each in
    # fixed (m, kg, s) order: "kg m^-3", "m s^-1"
    named.sort(key=lambda ne: (ne[1] < 0, _DIM_NAMES.index(ne[0])))
    return " ".join(n if e == 1 else f"{n}^{e}" for n, e in named)


_SPEC_RE = re.compile(
    r"^\s*(?P<lo>-?\d+(?:\.\d+)?)\s*(?:to\s+(?P<hi>-?\d+(?:\.\d+)?)\s*)?"
    r"(?P<unit>[a-zA-Z][a-zA-Z0-9^/²³ .]*?)\s*$"
)


def parse_spec(spec: str) -> tuple[str, float, float]:
    """'30 cm' -> ('m', 0.3, 0.3); '1 to 3 feet' -> ('m', 0.3048,
    0.9144); '2 square feet' -> ('m^2', ...); '5 km/h' ->
    ('m s^-1', ...)."""
    m = _SPEC_RE.match(spec)
    if not m:
        raise ValueError(f"unparseable measurement spec {spec!r}")
    dim, factor = parse_unit(m.group("unit"))
    sig = dimension_signature(dim)
    lo = float(m.group("lo")) * factor
    hi = float(m.group("hi")) * factor if m.group("hi") else lo
    if hi < lo:
        lo, hi = hi, lo
    return sig, lo, hi


def spec_predicate(spec: str, unit_col: str = "normalized_unit",
                   min_col: str = "normalized_min",
                   max_col: str = "normalized_max") -> Column:
    """Rewrite a spec to an interval-overlap predicate over normalized
    columns: rows whose [min, max] overlaps the spec's [lo, hi] in the
    same dimension (the helper's overlap cases, :318-377). Dimension
    equality makes cross-dimension matches impossible — '2 kg' can
    never select a length row."""
    sig, lo, hi = parse_spec(spec)
    return (
        (F.col(unit_col) == sig)
        & (F.col(min_col) <= F.lit(hi))
        & (F.col(max_col) >= F.lit(lo))
    )


def normalization_map() -> Column:
    """Expression-level normalizer for ingest: a literal map from every
    SINGLE-TOKEN unit name to (normalized_unit signature, factor).
    Usage: ``m = normalization_map();
    df.select(m[F.lower("unit")]["unit"], value * m[F.lower("unit")]["factor"])``
    — stays in codegen, no per-row Python. Compound/multi-word units
    are a spec-side (query-time) feature; ingest vocabularies are
    closed per-corpus, matching the reference's tagger-side
    normalization."""
    entries = []
    for name, (f, d) in sorted(_UNITS.items()):
        entries.append(F.lit(name))
        entries.append(F.struct(
            F.lit(dimension_signature(d)).alias("unit"),
            F.lit(float(f)).alias("factor"),
        ))
    return F.create_map(*entries)


def measurement_helper(value_col: str = "value", unit_col: str = "unit"):
    """Decorator-style annotation helper (the reference's
    MeasurementAnnotationHelper delegating to a standard helper,
    MeasurementAnnotationHelper.java:122-180): adds the normalized
    virtual features (normalized_unit / normalized_min /
    normalized_max) from a raw (value, unit) pair via the literal
    normalization map — rows whose unit the vocabulary doesn't know
    get NULL features (the reference's unparseable-measurement
    behavior: such mentions simply never match a spec). Compose with
    ``ingest.compose_helpers(base, measurement_helper(...))``."""
    from pyspark.sql import DataFrame

    def helper(df: DataFrame) -> DataFrame:
        entry = normalization_map()[F.lower(F.trim(F.col(unit_col)))]
        nv = F.col(value_col).cast("double") * entry["factor"]
        return (
            df.withColumn("normalized_unit", entry["unit"])
            .withColumn("normalized_min", nv)
            .withColumn("normalized_max", nv)
        )

    return helper
