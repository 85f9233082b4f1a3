"""Size-gated broadcast hints.

_BROADCAST_RULE (``workloads_analytics.py``) bans hard ``F.broadcast``
hints on join sides that grow with scale factor: a hint bypasses AQE,
so at the 100 TB design point it *fails* the job (build-side OOM /
``spark.sql.broadcastTimeout``) instead of degrading to a shuffle
join. But a few plans — notably the bucketed fact layouts, whose whole
point is that the big-big join needs NO exchange — pay a real price
for leaving the decision to AQE: the static planner schedules the
un-hinted side as a sort-merge join, and by the time AQE re-plans it
to broadcast, the fact-stream exchange has already materialized as a
shuffle stage.

``maybe_broadcast`` resolves the tension with the optimizer's own
cost-model estimate (``LogicalPlan.stats.sizeInBytes`` — pure
metadata, no job): hint only while the estimate fits under a bound.
Past the bound the frame is returned un-hinted and AQE owns the
strategy, so the 100× behavior is "shuffle join", never "broadcast
OOM". The estimate is conservative in exactly the safe direction —
Catalyst propagates raw file sizes through most filters without
selectivity credit, so an over-estimate drops the hint (harmless;
AQE still broadcasts small sides) while an under-estimate would need
the *files on disk* to be small, which bounds the true build size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default bound: 64 MiB of optimizer-estimated bytes. Deliberately
# larger than Spark's 10 MiB autoBroadcastJoinThreshold default (the
# gate exists to ALLOW hinting mid-size dimension slices the static
# planner would refuse) but far below executor memory, so a frame that
# passes the gate is always a safe build side.
_DEFAULT_BOUND_BYTES = 64 * 1024 * 1024


def maybe_broadcast(
    df: DataFrame,
    bound_bytes: int = _DEFAULT_BOUND_BYTES,
    size_of: DataFrame | None = None,
) -> DataFrame:
    """Return ``F.broadcast(df)`` iff the optimizer's size estimate is
    under ``bound_bytes``; otherwise return ``df`` unchanged (AQE
    decides). Estimation is driver-side metadata only — no Spark job
    runs.

    ``size_of``: frame whose estimate stands in for ``df``'s. Without
    CBO statistics Catalyst's size visitor multiplies child sizes
    through a join, so a dim-enriched frame (customer ⋈ 25-row nation)
    estimates as a multi-GB product even when its true size is
    |customer| × a small constant. Passing the pre-join base (the
    customer scan — file-size-backed, grows with SF exactly as the
    enriched frame does) restores a meaningful gate. Callers must only
    do this when ``size_of``'s estimate provably upper-bounds ``df``'s
    true size; the two legal patterns are
    (a) ``df`` is ``size_of`` equi-joined onto unique-key dims (row
        count preserved; the base scan's file-size estimate grows with
        SF exactly as ``df`` does), and
    (b) ``df`` is an aggregate keyed by ``size_of``'s unique key
        (e.g. a per-partkey average with ``size_of=`` the part scan):
        the aggregate has at most one row per key and narrower rows
        than the base, so the base scan's estimate is again a
        SF-tracking upper bound — Catalyst's own Aggregate estimate
        would instead be the (fact-table-sized) child estimate, which
        over-drops the hint.
    In either case a filtered base may over-state ``df`` (Catalyst
    gives filters no selectivity credit) — over-statement only drops
    the hint, never OOMs it, which is the safe direction."""
    try:
        probe = size_of if size_of is not None else df
        est = int(
            probe._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except (AttributeError, TypeError, ValueError):
        # Connect sessions (`_jdf` missing → AttributeError) or a
        # non-numeric/overflowing stats payload: never hint on an
        # unknown size — AQE is the safe default. Analysis errors
        # (unresolved plans etc.) propagate: converting them to "no
        # hint" here would just resurface them later with less
        # context (r13 ADVICE).
        return df
    if est <= bound_bytes:
        return F.broadcast(df)
    return df
