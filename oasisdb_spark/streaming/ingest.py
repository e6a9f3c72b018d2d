"""Streaming ingest into the vector catalog — the continuous write path.

The reference ingests only via synchronous REST upserts
(handlers.go:185-213 / :300-320); a 100 TB pipeline feeds the store
from a stream. This module closes that gap with foreachBatch: each
micro-batch runs the SAME batch write path the API uses —
``Catalog.upsert_documents`` (newest-wins merge, atomic swap) followed
by ``search.add_to_index`` (assign/encode against the current built
centroids, append to the on-disk inverted lists — no retrain). Exactly
the keep-the-derived-table-fresh pattern: the stream maintains both the
document store and the live index between periodic ``build_index``
rebuilds (the centroid-refresh/compaction analogue).

foreachBatch is the right tool because the write is transactional at
micro-batch grain: the checkpoint records the batch id, and replays are
idempotent — upsert is newest-wins by id, and add_to_index anti-joins
ids already present in the lists, so a replayed batch is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from oasisdb_spark.catalog import Catalog

__all__ = ["stream_upsert"]


def stream_upsert(
    catalog: Catalog,
    name: str,
    stream: DataFrame,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Attach a streaming DataFrame of documents (id STRING, vector
    ARRAY<FLOAT>, parameters MAP<STRING,STRING>) to a collection.
    Returns the StreamingQuery (drained already if available_now)."""
    from oasisdb_spark.search import add_to_index

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        catalog.upsert_documents(name, batch_df)
        add_to_index(catalog, name, batch_df)

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        # drain what's available and stop (backfills/tests); False runs
        # continuously on the default micro-batch trigger
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
