"""Measurement-spec rewrite: unit-normalized range predicates.

Re-expression of the reference's measurements helper, which parses
"30 cm" / "1 to 3 feet" specs, normalizes units, and rewrites them to
disjunctions of range constraints over normalized value/unit columns
with interval-overlap semantics
(plugins/measurements/.../MeasurementAnnotationHelper.java:238-377,
381-418). Here the rewrite is a pre-plan Python function producing a
plain Column predicate — no Catalyst rule needed (SURVEY.md §4.1):
Catalyst then pushes the resulting ranges into the scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# conversion factors to SI base units
_UNITS = {
    # length -> metre
    "m": ("m", 1.0), "metre": ("m", 1.0), "meter": ("m", 1.0),
    "cm": ("m", 0.01), "mm": ("m", 0.001), "km": ("m", 1000.0),
    "in": ("m", 0.0254), "inch": ("m", 0.0254),
    "ft": ("m", 0.3048), "foot": ("m", 0.3048), "feet": ("m", 0.3048),
    # mass -> kilogram
    "kg": ("kg", 1.0), "g": ("kg", 0.001), "mg": ("kg", 1e-6),
    "lb": ("kg", 0.45359237), "pound": ("kg", 0.45359237),
    # time -> second
    "s": ("s", 1.0), "sec": ("s", 1.0), "second": ("s", 1.0),
    "min": ("s", 60.0), "minute": ("s", 60.0),
    "h": ("s", 3600.0), "hour": ("s", 3600.0),
    "ms": ("s", 0.001), "us": ("s", 1e-6),
}

_SPEC_RE = re.compile(
    r"^\s*(?P<lo>-?\d+(?:\.\d+)?)\s*(?:to\s+(?P<hi>-?\d+(?:\.\d+)?)\s*)?"
    r"(?P<unit>[a-zA-Z]+)\s*$"
)


def parse_spec(spec: str) -> tuple[str, float, float]:
    """'30 cm' -> ('m', 0.3, 0.3); '1 to 3 feet' -> ('m', 0.3048, 0.9144)."""
    m = _SPEC_RE.match(spec)
    if not m:
        raise ValueError(f"unparseable measurement spec {spec!r}")
    unit_raw = m.group("unit").lower()
    unit_raw = unit_raw.rstrip("s") if unit_raw not in _UNITS and unit_raw.endswith("s") else unit_raw
    if unit_raw not in _UNITS:
        raise ValueError(f"unknown unit {m.group('unit')!r}")
    base, factor = _UNITS[unit_raw]
    lo = float(m.group("lo")) * factor
    hi = float(m.group("hi")) * factor if m.group("hi") else lo
    if hi < lo:
        lo, hi = hi, lo
    return base, lo, hi


def spec_predicate(spec: str, unit_col: str = "normalized_unit",
                   min_col: str = "normalized_min",
                   max_col: str = "normalized_max") -> Column:
    """Rewrite a spec to an interval-overlap predicate over normalized
    columns: rows whose [min, max] overlaps the spec's [lo, hi] in the
    same base unit (the helper's overlap cases, :318-377)."""
    base, lo, hi = parse_spec(spec)
    return (
        (F.col(unit_col) == base)
        & (F.col(min_col) <= F.lit(hi))
        & (F.col(max_col) >= F.lit(lo))
    )
