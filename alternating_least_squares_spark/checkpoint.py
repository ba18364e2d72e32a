"""Rotating localCheckpoint — bounded storage for iterative loops.

``DataFrame.localCheckpoint(eager=True)`` materializes the plan into
cached RDD blocks and truncates lineage — exactly what a
Pregel-as-DataFrames loop needs — but the blocks stay pinned in
executor storage until the SESSION ends: ``DataFrame.unpersist()``
releases only CacheManager entries (``df.persist()``), never the
internal RDD a checkpoint cached. A 10-round loop therefore leaves 10
generations of state pinned, and a long-lived session (a notebook, a
bench, a driver running many queries) accumulates them across calls —
measured in round 13 as 9 orphaned persistent RDDs per
``components_fixed`` call, and as end-of-suite pressure inflating
unrelated queries 2-4x before the bench grew an explicit sweeper.

:func:`rotate_local_checkpoint` fixes the leak at the source: it
checkpoints the new state, then releases the blocks owned by the
PREVIOUS rotation (safe — the new checkpoint is already materialized,
so nothing recomputes through the superseded generation). Ownership is
tracked by diffing ``getPersistentRDDs`` ids around the checkpoint
call; that is the only handle PySpark exposes to a checkpoint's
internal RDD.

Assumption (same as the loops themselves): one rotation chain is
advanced from a single driver thread. Concurrent checkpoint creation
from OTHER threads between the before/after snapshots would be
mis-attributed to this chain and released with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rotate_local_checkpoint(
    df: DataFrame, owned: set[int] | None
) -> tuple[DataFrame, set[int]]:
    """Eagerly localCheckpoint ``df``, release the blocks of the
    previous rotation (``owned``), and return
    ``(checkpointed_df, ids_owned_by_the_new_rotation)``.

    Pass ``owned=None`` (or an empty set) for the first rotation.
    The FINAL rotation's blocks are intentionally left pinned — the
    returned DataFrame reads from them; they are released when the
    caller's own result is rotated away or the session ends.
    """
    jsc = df.sparkSession.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keys())
    out = df.localCheckpoint(eager=True)
    live = jsc.getPersistentRDDs()
    new_ids = set(live.keys()) - before
    for rid in owned or ():
        jrdd = live.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)
    return out, new_ids


def release_local_checkpoint(df: DataFrame, owned: set[int] | None) -> None:
    """Release a rotation's blocks explicitly — for loops where the
    superseded generation is still READ after the new checkpoint is
    created (e.g. label_propagation's changed-count join against the
    old labels), so the release must happen later than
    :func:`rotate_local_checkpoint` would do it. ``df`` only supplies
    the session; ``owned=None`` is a no-op."""
    if not owned:
        return
    live = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
    for rid in owned:
        jrdd = live.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)
