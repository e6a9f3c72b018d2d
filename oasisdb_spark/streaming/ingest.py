"""Streaming ingestion into a collection: continuous embedding upsert.

The reference has no streaming surface (SURVEY.md §2.4) — its write path
is request-at-a-time REST upsert (db/document.go:53-92). The Spark-native
equivalent of "documents keep arriving and must become searchable" is a
Structured Streaming sink: each micro-batch is upserted into the
collection (newest-wins merge) and fed to the incremental index add, so
arrivals are searchable at the batch boundary without a rebuild — the
streaming twin of the client's upsert → AddVector path.

Exactly-once story: foreachBatch may re-deliver a batch on recovery;
both sides are idempotent (upsert is newest-wins by id; add_to_index
drops ids already present in the lists), so replays converge to the
same state. Checkpointing tracks source progress.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from oasisdb_spark.catalog import Catalog

__all__ = ["stream_upsert"]


def stream_upsert(
    catalog: Catalog,
    name: str,
    docs_stream: DataFrame,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start a streaming query that ingests (id, vector[, parameters])
    rows into the collection. available_now=True drains what's currently
    available and stops (batch-like, used by tests/backfills); False runs
    continuously with the default trigger."""
    from oasisdb_spark.search import add_to_index

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        catalog.upsert_documents(name, batch_df)
        add_to_index(catalog, name, batch_df)

    writer = (
        docs_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
