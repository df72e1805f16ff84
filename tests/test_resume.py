"""Exact-resume semantics (north rule; SURVEY.md §5.2.6): an interrupted +
resumed run must produce the identical triple set as an uninterrupted run,
with each bucket group committed exactly once."""

from __future__ import annotations

import pytest

from glre_spark.datagen import pages_df
from glre_spark.lineage import (
    pending_groups,
    read_manifest,
    read_triples,
    run_with_checkpoints,
)

N_DOCS = 60
GROUPS = 3


def _triples(spark, base):
    return sorted(
        (r.subj, r.pred, r.obj, r.score) for r in read_triples(spark, base).collect()
    )


def test_crash_and_resume_equals_single_run(spark, tmp_path):
    straight = str(tmp_path / "straight")
    crashed = str(tmp_path / "crashed")
    pages = pages_df(spark, N_DOCS, partitions=4)

    run_with_checkpoints(spark, pages, straight, n_groups=GROUPS)

    with pytest.raises(RuntimeError, match="injected failure"):
        run_with_checkpoints(spark, pages, crashed, n_groups=GROUPS, fail_after=1)
    done_after_crash = GROUPS - len(pending_groups(spark, crashed, GROUPS))
    assert done_after_crash == 1

    run_with_checkpoints(spark, pages, crashed, n_groups=GROUPS)  # resume
    assert _triples(spark, crashed) == _triples(spark, straight)

    manifest = read_manifest(spark, crashed)
    per_group = manifest.filter("status='done'").groupBy("bucket_group").count()
    assert per_group.filter("count > 1").isEmpty()
    assert per_group.count() == GROUPS
