"""Structured job-level logging.

The reference wrapped Log4j for its Spark job (``spark/lib/logger.py:1-19``)
and leaned on Airflow task logs for the DAGs. The engine's equivalent is a
structured stdlib logger (JSON lines — greppable locally, ingestible by any
log pipeline on a cluster) plus a job context manager that pairs with
``operators/checks.observed`` so a pipeline stage logs its duration AND the
metrics that rode the job, without a second pass over the data.

Driver-side only by design: executors never log through Python (their stdout
goes to Spark's own executor logs); anything worth recording from the data
plane arrives via ``df.observe`` metrics, accumulators, or the returned
counts — never per-row logging, which at 100 TB is a DDoS on the log system.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from contextlib import contextmanager
from typing import Any

__all__ = ["get_logger", "job_log", "StructuredFormatter"]


class StructuredFormatter(logging.Formatter):
    """One JSON object per line: ts, level, logger, message, plus any
    ``extra={"ctx": {...}}`` fields flattened in."""

    def format(self, record: logging.LogRecord) -> str:
        out: dict[str, Any] = {
            "ts": self.formatTime(record, "%Y-%m-%dT%H:%M:%S"),
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        }
        ctx = getattr(record, "ctx", None)
        if ctx:
            out.update(ctx)
        if record.exc_info:
            out["exc"] = self.formatException(record.exc_info)
        return json.dumps(out, default=str)


def get_logger(name: str = "scraping_jobsdb_spark") -> logging.Logger:
    """A logger emitting structured JSON lines to stderr (idempotent setup)."""
    logger = logging.getLogger(name)
    if not any(
        isinstance(h, logging.StreamHandler)
        and isinstance(h.formatter, StructuredFormatter)
        for h in logger.handlers
    ):
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(StructuredFormatter())
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


@contextmanager
def job_log(logger: logging.Logger, job: str, **ctx: Any):
    """Log a job's start, outcome, and wall time as structured records.

    Yields a mutable dict — put counts / observation metrics in it and they
    land on the completion record::

        with job_log(log, "ingest", run_date=str(d)) as rec:
            rec["new_rows"] = table.idempotent_append(df, keys)
    """
    record: dict[str, Any] = {}
    logger.info(f"{job} started", extra={"ctx": {"job": job, **ctx}})
    t0 = time.perf_counter()
    try:
        yield record
    except Exception:
        logger.error(
            f"{job} failed",
            extra={
                "ctx": {
                    "job": job,
                    "sec": round(time.perf_counter() - t0, 3),
                    **ctx,
                }
            },
            exc_info=True,
        )
        raise
    logger.info(
        f"{job} finished",
        extra={
            "ctx": {
                "job": job,
                "sec": round(time.perf_counter() - t0, 3),
                **ctx,
                **record,
            }
        },
    )
