"""Executor-side HTTP fetch with retry — the real acquisition path behind
the catalog Python Data Source.

The reference's fetch layer is a driver-side WebDriver/requests loop with
politeness sleeps and no retry (base_scraper.py:118-123 `_download_file`,
ishares.py:97-137 per-product enrichment, sleeps at ishares.py:103).
Engine-side, the fetch runs INSIDE `DataSourceReader.read` on executors:
each page partition fetches independently, a transient failure retries
with exponential backoff in-place, and a hard failure fails only that
task (Spark's task retry re-runs one page, not the whole scrape).

stdlib urllib only — no third-party HTTP dependency. Politeness delay is
per-request and opt-in: at 1000 executors the *per-host* rate is what
matters, so production deployments bound it by capping concurrent tasks
per host (partition coalescing), not by sleeping harder.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

RETRYABLE_STATUS = {429, 500, 502, 503, 504}


def fetch_with_retry(
    url: str,
    retries: int = 3,
    backoff_s: float = 0.05,
    timeout_s: float = 10.0,
    politeness_s: float = 0.0,
) -> bytes:
    """GET ``url``; retry transient failures (connection errors and
    RETRYABLE_STATUS codes) with exponential backoff. Non-retryable HTTP
    errors (4xx except 429) raise immediately — a 404 page will never
    heal, so burning retries on it only hides bugs. Returns body bytes.
    """
    if politeness_s > 0:
        time.sleep(politeness_s)
    attempt = 0
    while True:
        try:
            with urllib.request.urlopen(url, timeout=timeout_s) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code not in RETRYABLE_STATUS or attempt >= retries:
                raise
        except urllib.error.URLError:
            if attempt >= retries:
                raise
        time.sleep(backoff_s * (2**attempt))
        attempt += 1


def fetch_json_page(
    base_url: str,
    page: int,
    retries: int = 3,
    politeness_s: float = 0.0,
) -> list[dict]:
    """Fetch ``{base_url}/page/{page}`` and parse it as a JSON array of
    record objects (the engine's catalog-page wire format)."""
    body = fetch_with_retry(
        f"{base_url.rstrip('/')}/page/{page}",
        retries=retries,
        politeness_s=politeness_s,
    )
    rows = json.loads(body.decode("utf-8"))
    if not isinstance(rows, list):
        raise ValueError(f"page {page}: expected JSON array")
    return rows
