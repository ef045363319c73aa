"""Shared test helpers."""


def rows(df):
    """Collect to a canonically-sorted list of tuples over name-sorted cols."""
    cols = sorted(df.columns)
    data = [tuple(r[c] for c in cols) for r in df.collect()]
    key = lambda t: tuple((v is None, str(type(v)), v) for v in t)
    return sorted(data, key=key), cols


def ivals(spark, triples, extra=None):
    """Build an interval DataFrame from (chrom, start, end[, ...]) tuples.

    ``extra``: list of (name, ddl_type) for trailing columns.
    """
    schema = "chrom string, start long, end long"
    for name, typ in extra or []:
        schema += f", {name} {typ}"
    return spark.createDataFrame(triples, schema)
