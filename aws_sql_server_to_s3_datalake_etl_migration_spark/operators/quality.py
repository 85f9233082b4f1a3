"""Data-quality expectation checks, in-engine.

Lifts the reference's operational data-validation posture — the recon
report's row-count comparison (``reporting_utils.py:63-74``, README
"data quality assurance and data validation") — into declarative,
per-rule expectations evaluated inside Spark and returned as a small
queryable report (one row per rule: violation count + pass flag), the
shape dbt tests / Deequ checks produce.

Scale posture: all row-level rules for one table are folded into a
SINGLE aggregation pass (conditional sums over one scan — adding a rule
costs an expression, not a scan); uniqueness rules ride the same pass
as ``count - countDistinct``. Referential rules are each one
broadcast-capable left-anti join aggregated to a single row. Every
output is a 1-row aggregate, so the final union is driver-cheap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def expectation_report(
    df: DataFrame,
    row_rules: dict[str, Column] | None = None,
    unique_rules: dict[str, list[str]] | None = None,
    ref_rules: dict[str, tuple[list[str], DataFrame, list[str]]] | None = None,
) -> DataFrame:
    """Evaluate expectations against ``df``.

    - ``row_rules``: rule name -> *violation predicate* (true == row
      violates the expectation).
    - ``unique_rules``: rule name -> column list that must be unique;
      violations = total rows - distinct combinations.
    - ``ref_rules``: rule name -> (child cols, parent df, parent cols);
      violations = child rows whose key has no match in the parent
      (left-anti join), null child keys counting as violations.

    Returns columns ``rule STRING, violations BIGINT, passed BOOLEAN``.
    """
    row_rules = row_rules or {}
    unique_rules = unique_rules or {}
    ref_rules = ref_rules or {}
    if not (row_rules or unique_rules or ref_rules):
        raise ValueError("no expectations given")

    parts: list[DataFrame] = []

    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(name)
        for name, pred in row_rules.items()
    ]
    aggs += [
        (F.count(F.lit(1)) - F.countDistinct(*cols)).cast("bigint").alias(name)
        for name, cols in unique_rules.items()
    ]
    if aggs:
        one = df.agg(*aggs)
        for name in list(row_rules) + list(unique_rules):
            parts.append(
                one.select(
                    F.lit(name).alias("rule"),
                    F.col(name).alias("violations"),
                )
            )

    for name, (child_cols, parent, parent_cols) in ref_rules.items():
        cond = None
        child = df.select(*child_cols).alias("c")
        par = parent.select(*parent_cols).alias("p")
        for cc, pc in zip(child_cols, parent_cols):
            clause = F.col(f"c.{cc}") == F.col(f"p.{pc}")
            cond = clause if cond is None else (cond & clause)
        parts.append(
            child.join(par, cond, "left_anti").agg(
                F.lit(name).alias("rule"),
                F.count(F.lit(1)).cast("bigint").alias("violations"),
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("violations") == 0)


def observed_write(
    df: DataFrame,
    writer_fn,
    metrics: dict[str, Column] | None = None,
    row_rules: dict[str, Column] | None = None,
) -> dict:
    """In-flight data-quality metrics via ``df.observe``: aggregate
    expressions are accumulated WHILE the write action scans the data,
    so quality numbers cost zero extra passes — at lake scale a
    separate ``expectation_report`` scan doubles ingest I/O, this
    doesn't.

    - ``metrics``: name -> aggregate Column (e.g. ``F.count(F.lit(1))``,
      ``F.sum("v")``).
    - ``row_rules``: name -> violation predicate (true == violating
      row); each becomes a conditional count named ``<name>_violations``.

    ``writer_fn(df)`` must run exactly one action over the observed
    frame (typically the sink write). Returns the observed metric dict.
    Use for ingest pipelines where the report should describe exactly
    the rows written, not a re-scan that may race a concurrent update.
    """
    from pyspark.sql import Observation

    aggs = dict(metrics or {})
    for name, pred in (row_rules or {}).items():
        aggs[f"{name}_violations"] = F.sum(
            F.when(pred, 1).otherwise(0)
        ).cast("long")
    if not aggs:
        raise ValueError("observed_write needs at least one metric or rule")
    obs = Observation()
    names = list(aggs)
    observed = df.observe(obs, *[aggs[n].alias(n) for n in names])
    writer_fn(observed)
    return obs.get


def benford_profile(df: DataFrame, amount_col: str) -> DataFrame:
    """First-significant-digit distribution of a positive monetary
    column against Benford's law — the classic fraud/synthetic-data
    screen a DQ layer runs next to null/range checks
    (``expectation_report``).

    The digit is taken from the DECIMAL(18,4) string rendering (both
    Spark and any ANSI engine print decimals in plain positional
    form), NOT from floor(x / 10^floor(log10 x)) — the log/floor round
    trip can misclassify at power-of-ten boundaries and libm log10
    need not be bit-identical across engines. Expected shares are the
    nine literal doubles log10(1 + 1/d) computed once in Python, so
    observed-vs-expected and the chi-square contribution are exact
    integer counts + one fixed double expression: bit-stable across
    engines and partition orderings.

    One map-side-combinable groupBy on a 9-value key — no sort, no
    skew (digit 1 carries ~30% of rows by construction; 9 groups never
    need salting).
    """
    import math

    expected = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
    emap = F.create_map(
        *[c for d, e in expected.items() for c in (F.lit(str(d)), F.lit(e))]
    )
    digits = (
        df.where(F.col(amount_col) >= 1)
        .select(
            F.substring(
                F.col(amount_col).cast("decimal(18,4)").cast("string"), 1, 1
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    total = Window.partitionBy()
    out = digits.withColumn("_total", F.sum("n_rows").over(total))
    obs = F.col("n_rows").cast("double") / F.col("_total").cast("double")
    exp = F.element_at(emap, F.col("digit"))
    return out.select(
        "digit",
        "n_rows",
        obs.alias("obs_share"),
        exp.alias("exp_share"),
        ((obs - exp) * (obs - exp) / exp).alias("chi2_term"),
    )
