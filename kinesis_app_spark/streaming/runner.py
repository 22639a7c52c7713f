"""Checkpointed stream execution + the Processor API.

Reference parity:
- ``Processor`` (src/Kinesis/Coordination.hs:51-53) is the reference's
  entire computation surface: a callback receiving each record plus an ack
  action; acks advance a max-sequence checkpoint that is unsafe under
  out-of-order acks (src/Kinesis/Coordination.hs:331-332 — `max` can skip
  unacked records). Here the processor is a ``foreachBatch`` callable
  ``(DataFrame, batch_id) -> None``; the epoch commit IS the ack, which is
  strictly stronger (exactly-once per batch) — an intentional behavioral
  improvement, documented in SURVEY.md §7.4.
- ``masterLoop``'s forever-tick (src/Kinesis/Coordination.hs:100-107) is
  the driver's MicroBatchExecution loop; ``configLoopDelay`` maps to the
  trigger interval.
- kill/restart resume (src/Kinesis/Kinesis.hs:62-65) is the
  checkpointLocation offset+commit log, tested in tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

#: the Processor type: called once per micro-batch epoch with the batch
#: DataFrame and the epoch id. Epoch commit = ack.
Processor = Callable[[DataFrame, int], None]


@dataclass
class StreamRunner:
    """Builds and starts checkpointed streaming queries."""

    checkpoint_dir: str

    def run(
        self,
        df: DataFrame,
        sink_format: str = "memory",
        query_name: str = "kinesis_app_query",
        output_mode: str = "append",
        trigger_interval: str | None = None,
        available_now: bool = False,
        path: str | None = None,
        partition_by: list[str] | None = None,
    ) -> StreamingQuery:
        writer = (
            df.writeStream.outputMode(output_mode)
            .format(sink_format)
            .queryName(query_name)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if path:
            writer = writer.option("path", path)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if available_now:
            # drain-everything-then-stop: the deterministic test trigger
            writer = writer.trigger(availableNow=True)
        elif trigger_interval:
            # reference: masterLoop tick / 1 s poll pacing
            writer = writer.trigger(processingTime=trigger_interval)
        return writer.start()

    def run_processor(
        self,
        df: DataFrame,
        processor: Processor,
        query_name: str = "kinesis_app_processor",
        output_mode: str = "update",
        available_now: bool = False,
        trigger_interval: str | None = None,
    ) -> StreamingQuery:
        """The reference's Processor surface: user code sees every batch;
        the epoch commit in the checkpoint log is the ack."""
        writer = (
            df.writeStream.outputMode(output_mode)
            .queryName(query_name)
            .option("checkpointLocation", self.checkpoint_dir)
            .foreachBatch(processor)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_interval:
            writer = writer.trigger(processingTime=trigger_interval)
        return writer.start()


def run_stream(
    df: DataFrame,
    checkpoint_dir: str,
    **kwargs,
) -> StreamingQuery:
    return StreamRunner(checkpoint_dir).run(df, **kwargs)
