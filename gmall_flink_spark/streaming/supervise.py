"""W12: fixed-delay restart strategy for streaming queries.

The reference supervises jobs with Flink's fixed-delay restart
(app/lab/DimAndDwdApp.java:51 `RestartStrategies.fixedDelayRestart(100,
2000L)`); recovery correctness comes from checkpointing, restart policy is
orthogonal. The Spark twin: re-start the query from the SAME checkpoint
after a failure — W11 exactly-once resume (tested by
test_checkpoint_resume_no_duplicates) guarantees no duplicates across the
restart, this module supplies the retry policy."""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame


def run_supervised(
    build_stream: Callable[[], DataFrame],
    foreach_batch,
    checkpoint: str,
    max_restarts: int = 3,
    delay_s: float = 0.0,
    timeout_s: int = 300,
) -> int:
    """Run ``build_stream()`` to completion under availableNow, restarting
    from ``checkpoint`` on failure up to ``max_restarts`` times with a fixed
    delay. Returns the number of restarts used; re-raises after the budget
    is exhausted. ``build_stream`` is a factory because a failed query object
    is dead — each attempt redeclares the same plan against the same
    checkpoint."""
    attempts = 0
    while True:
        try:
            q = (
                build_stream()
                .writeStream.option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .foreachBatch(foreach_batch)
                .start()
            )
            finished = q.awaitTermination(timeout_s)
            if not finished:
                # still running at the deadline: returning now would report
                # success on a partial state AND leave the query writing
                # concurrently with the caller — stop it and count a failure
                q.stop()
                raise TimeoutError(
                    f"streaming query exceeded timeout_s={timeout_s}"
                )
            return attempts
        except Exception:
            attempts += 1
            if attempts > max_restarts:
                raise
            time.sleep(delay_s)
