"""Structured logging (observability.py): JSON records, job context, failure
paths. Driver-side only — no Spark needed."""

from __future__ import annotations

import json
import logging

import pytest

from scraping_jobsdb_spark.observability import (
    StructuredFormatter,
    get_logger,
    job_log,
)


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.records: list[str] = []
        self.setFormatter(StructuredFormatter())

    def emit(self, record):
        self.records.append(self.format(record))


@pytest.fixture()
def cap():
    logger = get_logger("sjs_test")
    h = _Capture()
    logger.addHandler(h)
    yield h
    logger.removeHandler(h)


def test_job_log_success_records_duration_and_results(cap):
    logger = logging.getLogger("sjs_test")
    with job_log(logger, "demo", run="r1") as rec:
        rec["rows"] = 42
    start, end = (json.loads(s) for s in cap.records)
    assert start["job"] == "demo" and start["run"] == "r1"
    assert end["msg"] == "demo finished"
    assert end["rows"] == 42 and end["sec"] >= 0


def test_job_log_failure_logs_and_reraises(cap):
    logger = logging.getLogger("sjs_test")
    with pytest.raises(ValueError):
        with job_log(logger, "boom"):
            raise ValueError("nope")
    end = json.loads(cap.records[-1])
    assert end["level"] == "ERROR" and end["msg"] == "boom failed"
    assert "ValueError" in end["exc"]


def test_every_record_is_one_json_line(cap):
    logger = logging.getLogger("sjs_test")
    with job_log(logger, "j", k="v"):
        pass
    for s in cap.records:
        assert "\n" not in s
        json.loads(s)


def test_get_logger_idempotent_handlers():
    a = get_logger("sjs_once")
    n = len(a.handlers)
    b = get_logger("sjs_once")
    assert b is a and len(b.handlers) == n
