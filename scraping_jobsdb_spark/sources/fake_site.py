"""Deterministic offline job-site simulator (test transport).

The ingestion pipeline takes an injectable ``transport: url -> html`` so tests
never touch the network (the reference's tests also never scrape live —
``spark/test_utils.py`` uses a checked-in fixture page). This module *is* that
fixture generator: a seeded, pure function from URL to HTML that mimics the
JobsDB page shapes the reference scrapes (``airflow/dags/scrape_url.py:37-77``
search pages with ``totalJobCount`` JSON + job links; detail pages with the
``data-automation`` slots ``spark/lib/utils.py:31-107`` selects on).

Being a module-level function it pickles cleanly into mapInPandas closures.
"""

from __future__ import annotations

import hashlib
import json
import re

PER_PAGE = 30

_TITLES = ["Data Engineer", "Analyst", "ML Engineer", "Backend Developer"]
_COMPANIES = ["Acme Ltd", "Globex", "Initech", "Umbrella Corp"]
_LOCATIONS = ["Central", "Kwun Tong", "Tsim Sha Tsui"]
_LEVELS = ["Entry Level", "Middle", "Senior"]
_FUNCTIONS = ["IT, Data", "Finance, Accounting", "Engineering, Hardware"]


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def total_jobs_for(keyword: str, lo: int, hi: int) -> int:
    """Deterministic corpus size per (keyword, band); a few combos are empty
    to exercise the zero-results branch (``scrape_url.py:211-213``)."""
    n = _h(f"{keyword}|{lo}|{hi}") % 70
    return 0 if n < 5 else n


def job_ids_for(keyword: str, lo: int, hi: int) -> list[str]:
    base = _h(f"ids|{keyword}|{lo}|{hi}")
    return [str(100000 + (base + i) % 900000) for i in range(total_jobs_for(keyword, lo, hi))]


def search_page_html(keyword: str, lo: int, hi: int, page: int) -> str:
    total = total_jobs_for(keyword, lo, hi)
    if total == 0:
        return '<html><body><div data-automation="zeroResultsPage">No jobs</div></body></html>'
    ids = job_ids_for(keyword, lo, hi)
    start, end = (page - 1) * PER_PAGE, min(page * PER_PAGE, total)
    links = "".join(
        f'<a href="/hk/en/job/{keyword}-{jid}">Job {jid}</a>' for jid in ids[start:end]
    )
    meta = json.dumps({"totalJobCount": total})
    return (
        f"<html><body><div data-automation=\"searchMeta\" data-meta='{meta}'>{meta}</div>"
        f"{links}</body></html>"
    )


def detail_page_html(job_id: str) -> str:
    i = _h(job_id)
    title = _TITLES[i % len(_TITLES)]
    company = _COMPANIES[i % len(_COMPANIES)]
    loc = _LOCATIONS[i % len(_LOCATIONS)]
    level = _LEVELS[i % len(_LEVELS)]
    funcs = _FUNCTIONS[i % len(_FUNCTIONS)]
    # every third job publishes a salary band; every fifth an "ago" date
    salary = (
        f"<span data-automation='job-salary'>HK${20 + i % 30},000 - "
        f"HK${55 + i % 40},000 /month</span>"
        if i % 3 == 0
        else ""
    )
    posted = (
        f"<span data-automation='job-post-date'>Posted {1 + i % 9} days ago</span>"
        if i % 5 == 0
        else "<span data-automation='job-post-date'>Posted on 03-Oct-22</span>"
    )
    return (
        "<html><body>"
        f"<h1 data-automation='job-title'>{title}</h1>"
        f"<div data-automation='company-name'>{company}</div>"
        f"<div data-automation='job-description'>Great {title} role at {company}.</div>"
        f"<div data-automation='job-location'>{loc}</div>"
        f"{posted}{salary}"
        f"<div data-automation='career-level'>{level}</div>"
        "<div data-automation='qualification'>Degree</div>"
        "<div data-automation='job-type'>Full Time</div>"
        f"<div data-automation='job-functions'>{funcs}</div>"
        "<div data-automation='industry'>Information Technology</div>"
        "</body></html>"
    )


def fake_transport(url: str) -> str:
    """url → html. Understands the two URL shapes the pipeline emits."""
    m = re.search(r"/search\?kw=([^&]+)&lo=(\d+)&hi=(\d+)&page=(\d+)", url)
    if m:
        return search_page_html(m.group(1), int(m.group(2)), int(m.group(3)), int(m.group(4)))
    m = re.search(r"/hk/en/job/[^/]*-(\d+)$", url)
    if m:
        return detail_page_html(m.group(1))
    raise ValueError(f"fake_transport: unrecognized url {url!r}")
