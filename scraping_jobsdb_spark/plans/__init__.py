"""Declared query inventory (the differential-oracle surface)."""

from scraping_jobsdb_spark.plans.queries import REGISTRY, Query

__all__ = ["REGISTRY", "Query"]
