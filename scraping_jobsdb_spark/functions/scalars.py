"""Scalar expression library: the reference's row-level functions (SURVEY.md
§2.6, F1-F16) as named, reusable Column builders.

The reference computes all of these in row-at-a-time Python (scraper loops and
the BeautifulSoup UDF body, ``airflow/dags/scrape_url.py`` /
``spark/lib/utils.py``). Here each is a JVM-side built-in expression — they
stay inside whole-stage codegen, cost no Python round-trip, and compose into
any query plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "slugify",
    "extract_trailing_id",
    "matches_job_href",
    "json_field",
    "pages_for",
    "date_parts",
    "parse_ddmmmyy",
    "to_iso_date",
    "clean_int",
    "split_item",
    "normalize_list",
    "strip_ws",
    "canonicalize_url",
    "registered_domain",
]


def slugify(col: Column | str) -> Column:
    """F1: keyword → URL slug (``scrape_url.py:54`` ``str.replace('_','-')``)."""
    return F.translate(F.col(col) if isinstance(col, str) else col, "_", "-")


def extract_trailing_id(col: Column | str) -> Column:
    """F2: trailing numeric id from a URL (``scrape_url.py:176``
    ``re.search(r'-(\\d*$)', url)``)."""
    return F.regexp_extract(col, r"-(\d+)$", 1)


def matches_job_href(col: Column | str) -> Column:
    """F3: href filter (``scrape_url.py:170`` ``re.compile('/hk/en/job.*')``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"/hk/en/job.*")


def json_field(col: Column | str, path: str) -> Column:
    """F4: JSON attribute extraction (``scrape_url.py:218``
    ``json.loads(attr)['totalJobCount']``)."""
    return F.get_json_object(F.col(col) if isinstance(col, str) else col, path)


def pages_for(total: Column, per_page: int = 30) -> Column:
    """F5: pagination ceil-division (``scrape_url.py:217-219``)."""
    return F.ceil(total / F.lit(float(per_page)))


def date_parts(col: Column | str) -> tuple[Column, Column, Column]:
    """F6: yyyy/mm/dd partition parts (``scrape_url.py:112`` slices the ISO
    string; here real date functions)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.year(c), F.month(c), F.dayofmonth(c)


def parse_ddmmmyy(col: Column | str) -> Column:
    """F11: '03-Oct-22' → date (``utils.py:59-61`` strptime('%d-%b-%y'))."""
    return F.to_date(F.col(col) if isinstance(col, str) else col, "dd-MMM-yy")


def to_iso_date(col: Column | str) -> Column:
    """F12: date → 'yyyy-MM-dd' string (``utils.py:56`` strftime)."""
    return F.date_format(F.col(col) if isinstance(col, str) else col, "yyyy-MM-dd")


def clean_int(col: Column | str) -> Column:
    """F10: '25,000' → 25000 (``utils.py:64-73`` replace(',','') + int)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, ",", "").cast("int")


def split_item(col: Column | str, sep: str, idx: int) -> Column:
    """F9: split-and-pick (``utils.py:58,65,69-72`` ``split(...)[i]``).
    ``idx`` is 0-based like Python's."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep).getItem(idx)


def normalize_list(col: Column | str) -> Column:
    """F15: comma list-in-string → array (``utils.py:97`` replaced ',' with
    ';'; the engine keeps real arrays)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(F.split(c, ","), lambda x: F.trim(x))


def strip_ws(col: Column | str) -> Column:
    """F14: trim (``utils.py:33-36,74,97``)."""
    return F.trim(F.col(col) if isinstance(col, str) else col)


_TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "fbclid", "gclid", "msclkid", "ref", "ref_src",
)


def canonicalize_url(col: Column | str) -> Column:
    """Crawl-dedup URL canonicalization (extension; the URL-level
    counterpart of the content-level dedup families): lowercase scheme
    and host, strip a leading ``www.``, strip the scheme's default port
    (:80 http / :443 https), drop the fragment, strip trailing path
    slashes, and rewrite the query string with tracking parameters
    (utm_*, fbclid, gclid, msclkid, ref) removed and the surviving
    ``k=v`` pairs sorted.

    Entirely JVM-side expressions (regexp extracts + array HOFs — no
    Python), so it composes into a scan at full codegen speed; a 100 TB
    crawl dedups on the result with one hash exchange. The transform is
    deliberately the standard, lossy-but-safe subset: no percent-decoding
    and no path-segment resolution, both of which can CHANGE request
    semantics on real servers.

    Contract: the input must carry an explicit ``scheme://`` — an input
    without one passes through UNCHANGED (null-safe), never degenerating
    to a ``"://..."`` remnant. Default-port stripping is scheme-exact:
    ``:80`` only for http, ``:443`` only for https; every other scheme's
    explicit port is preserved (``ftp://h:443/x`` keeps its port — 443 is
    not ftp's default)."""
    raw = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(raw, r"#.*$", "")  # fragment never reaches servers
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda kv: (kv != "")
            & ~F.lower(F.split(kv, "=").getItem(0)).isin(*_TRACKING_PARAMS),
        )
    )
    qtail = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(scheme == "", raw).otherwise(
        F.concat(scheme, F.lit("://"), host, path, qtail)
    )


def registered_domain(host_or_url: Column | str) -> Column:
    """Registered (pay-level) domain from a host or URL — the grouping
    key for per-site crawl caps and domain-mix reports. Heuristic: last
    two labels, or last three when the last two are a known two-label
    public suffix (co.uk-style); a full public-suffix list is a data
    file swap, not a code change."""
    c = F.col(host_or_url) if isinstance(host_or_url, str) else host_or_url
    host = F.when(
        c.contains("://"), F.regexp_extract(c, r"://([^/?#:]*)", 1)
    ).otherwise(F.regexp_extract(c, r"^([^/?#:]*)", 1))
    host = F.regexp_replace(F.lower(host), r"^www\.", "")
    parts = F.split(host, r"\.")
    n = F.size(parts)
    two = F.concat_ws(".", F.slice(parts, n - 1, 2))
    three = F.concat_ws(".", F.slice(parts, n - 2, 3))
    two_label_suffixes = (
        "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
        "co.jp", "or.jp", "ne.jp", "co.nz", "com.br", "com.cn", "com.sg",
        "co.in", "co.kr", "com.mx", "com.tr", "com.tw", "co.za",
    )
    return F.when(n <= 2, host).otherwise(
        F.when(two.isin(*two_label_suffixes), three).otherwise(two)
    )
