"""One-pass data-quality gates via ``DataFrame.observe`` (SURVEY.md §5 ⊕).

The reference validates by printing row counts after the fact
(etl_pipeline.py:63,129) — a second pass over data it already scanned.
``observe`` attaches named aggregate metrics to the SAME job that does
the real work: the metrics ride along with whatever action runs (a
write, a count), costing zero extra scans — the only affordable QA shape
when the action reads 100 TB. Metrics must be aggregate expressions the
observation can fold per-task (sum/count/min/max-style), which is also
why they're exact under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_metrics(
    df: DataFrame,
    checks: dict[str, Column],
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach named metric expressions; read them after the next action.

    Returns (df, observation); run exactly one action on the returned df
    (observe metrics are defined for a single action), then read
    ``observation.get``.
    """
    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in checks.items()]), obs


def null_and_range_checks(
    required: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> dict[str, Column]:
    """Standard gate: null counts for required columns, out-of-range
    counts for bounded columns, plus total rows. Compose with extra
    custom expressions before passing to :func:`with_quality_metrics`."""
    checks: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in required or []:
        checks[f"nulls_{c}"] = F.sum(F.col(c).isNull().cast("long"))
    for c, (lo, hi) in (ranges or {}).items():
        checks[f"oob_{c}"] = F.sum(
            (~F.col(c).between(lo, hi)).cast("long")
        )
    return checks


def assert_gate(observation: Observation, max_bad_fraction: float = 0.0) -> dict:
    """Fail the load if any nulls_*/oob_* metric exceeds the tolerated
    fraction of n_rows. Returns the metrics dict on success so callers
    can log/persist it as the load's quality record."""
    got = observation.get
    n = max(int(got.get("n_rows", 0)), 1)
    bad = {
        k: v
        for k, v in got.items()
        if (k.startswith("nulls_") or k.startswith("oob_"))
        and (v or 0) > max_bad_fraction * n
    }
    if bad:
        raise ValueError(f"quality gate failed: {bad} of {n} rows")
    return dict(got)
