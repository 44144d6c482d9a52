"""foreachBatch sinks with exactly-once replay semantics.

Structured Streaming guarantees each micro-batch a stable ``batch_id``
and replays the SAME input rows for a batch_id after a failure
(checkpointed source offsets). A foreachBatch handler is therefore
exactly-once iff it is idempotent per batch_id. Two standard recipes:

* :func:`foreach_batch_parquet_upsert` — transactional-directory
  protocol: each batch lands in ``target/batch_id=N`` and a replay of
  a committed batch is a no-op (the ``_SUCCESS`` marker is the commit
  record, written atomically by the Hadoop committer AFTER the data
  files). A partially-written batch (crash before marker) is
  re-written with ``overwrite``, which heals the partial state. The
  target is readable as one partitioned parquet table at any time.

* key-conflict upsert into a store with primary keys
  (io/jdbc_sink.upsert_jdbc, io/rest_sink chunked upsert): replays
  rewrite the same keys with the same values — idempotent by
  constraint rather than by commit protocol.

At 100 TB the directory protocol is the one that scales: no key index
is consulted, each executor writes its own files, and the only
serialization point is the marker rename.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


def foreach_batch_parquet_upsert(target_dir: str) -> Callable[[DataFrame, int], None]:
    """Return a foreachBatch handler writing each micro-batch to
    ``target_dir/batch_id=N`` exactly once across replays."""

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        dest = os.path.join(target_dir, f"batch_id={batch_id}")
        if os.path.exists(os.path.join(dest, "_SUCCESS")):
            return  # committed by a previous attempt: replay is a no-op
        batch_df.write.mode("overwrite").parquet(dest)

    return handler


def run_foreach_batch(
    sdf: DataFrame, handler: Callable[[DataFrame, int], None]
) -> None:
    """Execute a streaming plan to completion (AvailableNow) through a
    foreachBatch handler with a fresh checkpoint."""
    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="ckpt_fb_")
    q = (
        sdf.writeStream.foreachBatch(handler)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
