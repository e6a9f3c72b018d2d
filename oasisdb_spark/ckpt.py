"""localCheckpoint / persist lifecycle management (OPTIMIZATION r13,
guide §5).

``DataFrame.localCheckpoint`` materializes a frame's rows into
block-manager storage and truncates lineage — but the DataFrame API
has no matching release call: ``DataFrame.unpersist()`` only covers
``persist()`` entries registered with the CacheManager, so every
checkpoint holds its blocks until the JVM garbage-collects the RDD.
A long-lived session that re-executes an operator (the bench runs
every entry 3-4x in one JVM; a service would run them indefinitely)
therefore accumulates one dead generation of checkpoint blocks per
execution (VERDICT r12 #2: "zero unpersist calls anywhere").

Design: a session-scoped REGISTRY, not per-result finalizers. An
earlier draft tied each operator's checkpoints to the garbage
collection of its returned DataFrame wrapper (``weakref.finalize``)
— and failed in practice: entries that return a frame DERIVED from
the operator result drop the wrapper immediately, the finalizer
fires, and the derived frame's job dies with
``checkpointRDDBlockIdNotFoundError`` (observed on events_outliers /
mad_outliers). Python wrapper lifetime simply does not track plan
lifetime, so nothing here frees storage implicitly.

Instead, operators call ``track(df)`` on each checkpointed
intermediate (``track_persist(df)`` for CacheManager entries), and
the HARNESS — which alone knows when a query's result has been fully
materialized and will never be read again — calls
``release_tracked()`` between queries (bench.py between timed
entries, scripts/check_oracle.py and scripts/qtime.py between
comparisons). That keeps block-manager growth bounded at one entry's
working set across the bench's repeated sweeps.

Consumers that never call ``release_tracked()`` (unit tests, library
users) fall back to the pre-round-13 behavior — blocks freed when the
JVM garbage-collects the RDD — except that the registry caps itself:
past ``_CAP`` tracked handles the OLDEST are released eagerly (an
entry that old has long since been materialized; a single operator
call never tracks more than a handful of frames, so the working set
is never evicted).

``free_checkpoint(df)`` releases one checkpointed frame immediately —
for iterative operators where generation N+1 is materialized and
generation N is provably dead (connected_components' label frames).
Best-effort by design: freeing storage must never fail a query (a
stopped context or a plan that is not a LogicalRDD is ignored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "track",
    "track_persist",
    "release_tracked",
    "free_checkpoint",
    "checkpoint_rdd_handle",
]

_CAP = 128

# (kind, py4j handle): kind "rdd" unpersists a checkpointed RDD,
# "jdf" a CacheManager (persist) Dataset entry
_TRACKED: list[tuple[str, object]] = []


def checkpoint_rdd_handle(df: DataFrame):
    """The py4j handle of the RDD backing a localCheckpoint-ed frame
    (its analyzed plan is the LogicalRDD leaf created by
    ``Dataset.checkpoint``), or None when the plan is not a
    checkpoint leaf."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.nodeName() != "LogicalRDD":
            return None
        return plan.rdd()
    except Exception:
        return None


def _release(kind: str, handle) -> None:
    try:
        if kind == "rdd":
            handle.unpersist(False)
        else:
            handle.unpersist(False)
    except Exception:
        pass  # context stopped / gateway gone: nothing to free


def track(df: DataFrame) -> DataFrame:
    """Register a localCheckpoint-ed intermediate for release at the
    harness's next ``release_tracked()``. Returns ``df`` for
    chaining. No-op (safe) when the frame is not a checkpoint leaf."""
    h = checkpoint_rdd_handle(df)
    if h is not None:
        _TRACKED.append(("rdd", h))
        while len(_TRACKED) > _CAP:
            _release(*_TRACKED.pop(0))
    return df


def track_persist(df: DataFrame) -> DataFrame:
    """persist() analogue of ``track``: register a CacheManager entry
    for release at the next ``release_tracked()``."""
    try:
        _TRACKED.append(("jdf", df._jdf))
    except Exception:
        return df
    while len(_TRACKED) > _CAP:
        _release(*_TRACKED.pop(0))
    return df


def release_tracked() -> int:
    """Release every tracked checkpoint/persist. Call ONLY between
    queries — once the previous query's result (and every frame
    derived from it) has been fully materialized and will never run
    again. Returns the number of handles released."""
    n = len(_TRACKED)
    while _TRACKED:
        _release(*_TRACKED.pop())
    return n


def free_checkpoint(df: DataFrame) -> None:
    """Immediately release the block-manager storage of a
    localCheckpoint-ed frame. Only call once nothing will read the
    frame (or a frame derived from it) again."""
    h = checkpoint_rdd_handle(df)
    if h is not None:
        _release("rdd", h)
