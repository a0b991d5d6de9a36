"""External binding sources: the SPARQL-helper analogue.

The reference's sparql plugin runs a query against an external endpoint
and binds the resulting URIs into the annotation constraints — a
decorrelated external semi-join
(plugins/sparql/.../SPARQLSemanticAnnotationHelper.java:269-293). Here
the external set is loaded into a (small) DataFrame from a file or a
JDBC source and applied as a BROADCAST semi-join / decoration, which is
exactly the plan Catalyst builds for "restrict by an external
dimension" at any scale: the bindings move to the executors, the big
side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_bindings(spark: SparkSession, source: str,
                  fmt: str | None = None, **options) -> DataFrame:
    """Load an external binding set.

    ``source`` may be a file path (.json / .csv / .parquet inferred
    from the extension) or a ``jdbc:`` URL (pass ``dbtable`` / ``query``
    and credentials via ``options`` — Spark's built-in JDBC source).
    """
    if source.startswith("jdbc:"):
        reader = spark.read.format("jdbc").option("url", source)
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()
    fmt = fmt or source.rsplit(".", 1)[-1].lower()
    if fmt == "json":
        return spark.read.options(**options).json(source)
    if fmt == "csv":
        opts = {"header": "true", "inferSchema": "true", **options}
        return spark.read.options(**opts).csv(source)
    if fmt == "parquet":
        return spark.read.options(**options).parquet(source)
    raise ValueError(f"unsupported bindings format {fmt!r}")


def external_restrict(hits: DataFrame, bindings: DataFrame,
                      on: str = "conv_id") -> DataFrame:
    """Restrict hits to rows whose key appears in the external binding
    set — the ConstQuery-from-external-source path (broadcast
    left-semi; the bindings are the small side by construction)."""
    keys = bindings.select(on).distinct()
    return hits.join(F.broadcast(keys), on, "left_semi")


def external_annotate(rows: DataFrame, bindings: DataFrame,
                      on: str, how: str = "left") -> DataFrame:
    """Decorate rows with external binding attributes (the delegating
    helper's virtual features: DelegatingSemanticAnnotationHelper) —
    broadcast join, external columns become queryable features."""
    return rows.join(F.broadcast(bindings), on, how)
