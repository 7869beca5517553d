"""Custom Python DataSource: the job-board search surface as a real Spark
source (Spark 4 ``pyspark.sql.datasource`` API).

The reference drives its search scrape from an Airflow loop — 88 sequential
task chains, one per (keyword, salary-band) combo (``airflow/dags/
scrape_url.py:12-34,335-398``). Here the same surface is a first-class
``spark.read.format(...)`` source: each (keyword, band) combo is an
InputPartition, so the fetch parallelism IS the scan parallelism, planned by
Spark like any other source — S1/S2 as a source, not driver code.

The reader pulls pages through the deterministic offline simulator
(``fake_site``; tests never touch the network). A production deployment
swaps the transport for HTTP with per-partition rate limiting — partition
granularity is already the politeness boundary. Schema is fixed and
declared, so column pruning works like any DSv2 source.

Usage::

    spark.dataSource.register(JobSearchDataSource)
    df = (spark.read.format("jobsdb_sim")
          .option("keywords", "data-engineer,analyst")
          .option("bands", "10000:20000,20000:30000")
          .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

__all__ = ["JobSearchDataSource"]

_SCHEMA_DDL = "keyword string, salary_min int, salary_max int, page int, job_id string, url string"


class _ComboPartition(InputPartition):
    def __init__(self, keyword: str, lo: int, hi: int):
        self.keyword = keyword
        self.lo = lo
        self.hi = hi


class _SearchReader(DataSourceReader):
    def __init__(self, options):
        kws = options.get("keywords", "data-engineer")
        bands = options.get("bands", "10000:20000")
        self._keywords = [k for k in kws.split(",") if k]
        self._bands = [
            (int(b.split(":")[0]), int(b.split(":")[1])) for b in bands.split(",") if b
        ]

    def partitions(self):
        # one partition per search combo — the reference's 88-task fan-out
        # becomes scan parallelism
        return [
            _ComboPartition(k, lo, hi)
            for k in self._keywords
            for lo, hi in self._bands
        ]

    def read(self, partition: _ComboPartition):
        # imports inside read(): executed on the worker
        import math
        import re

        from scraping_jobsdb_spark.sources.fake_site import (
            PER_PAGE,
            search_page_html,
            total_jobs_for,
        )

        k, lo, hi = partition.keyword, partition.lo, partition.hi
        total = total_jobs_for(k, lo, hi)
        if total == 0:
            return
        link_re = re.compile(r'href="(/hk/en/job/[^"]*-(\d+))"')
        for page in range(1, math.ceil(total / PER_PAGE) + 1):
            html = search_page_html(k, lo, hi, page)
            for url, job_id in link_re.findall(html):
                yield (k, lo, hi, page, job_id, url)


class JobSearchDataSource(DataSource):
    """``spark.read.format("jobsdb_sim")`` — search-result memberships as a
    table (the raw_scraped_url fact of SURVEY.md §1.1, produced by a source
    instead of a scrape loop)."""

    @classmethod
    def name(cls) -> str:
        return "jobsdb_sim"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SearchReader(self.options)
