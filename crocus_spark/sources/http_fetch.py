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

import http.client
import json
import ssl
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
        except OSError:
            # URLError, socket.timeout/TimeoutError, and raw OS-level
            # failures raised mid-body by resp.read() all land here —
            # a timeout during the stream is the classic transient
            # failure the retry budget exists for, and it does NOT
            # arrive wrapped in URLError.
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


def filename_from_disposition(
    header: str | None, url: str, default: str = "download.bin"
) -> str:
    """Final filename for a downloaded payload: the Content-Disposition
    ``filename`` parameter when the server sends one (the browser rule),
    else the URL path's basename, else ``default``. Any directory
    components are stripped — a server can never steer the write outside
    the chosen output directory."""
    import email.message
    import os
    import urllib.parse

    if header:
        msg = email.message.Message()
        msg["content-disposition"] = header
        fn = msg.get_param("filename", header="content-disposition")
        if isinstance(fn, tuple):  # RFC 2231 (charset, lang, value)
            fn = fn[2]
        if fn:
            name = os.path.basename(str(fn)).strip()
            if name:
                return name
    path = urllib.parse.urlparse(url).path
    return os.path.basename(path) or default


def download_with_rename(
    url: str,
    out_dir: str,
    retries: int = 3,
    backoff_s: float = 0.05,
    timeout_s: float = 10.0,
) -> str:
    """Browser click-to-download analog (SNK3 — the reference drives
    Selenium to click Vanguard's CSV export and waits for the browser's
    ``.crdownload`` → final-name rename, vanguard.py:115-153). The engine
    version is the same two-phase commit without a browser:

    1. GET with redirects followed (the 'click');
    2. final filename from Content-Disposition / URL basename
       (:func:`filename_from_disposition`);
    3. stream the body to ``<final>.partial`` in ``out_dir``, flush +
       fsync;
    4. atomic ``os.replace`` to the final name.

    Readers can never observe a torn file — the final name appears only
    complete; a crashed attempt leaves a ``.partial`` that the next
    attempt truncates. Re-running is idempotent (atomic overwrite).
    Transient failures retry with the same backoff/classification policy
    as :func:`fetch_with_retry`. Returns the final file path.

    Executor-side by design: at fleet scale each task downloads its own
    partition's files into a task-scoped directory and the job commit
    publishes them — this helper is the per-file primitive."""
    import os

    attempt = 0
    while True:
        try:
            with urllib.request.urlopen(url, timeout=timeout_s) as resp:
                name = filename_from_disposition(
                    resp.headers.get("Content-Disposition"), resp.geturl()
                )
                final = os.path.join(out_dir, name)
                partial = final + ".partial"
                with open(partial, "wb") as f:
                    while True:
                        chunk = resp.read(1 << 16)
                        if not chunk:
                            break
                        f.write(chunk)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(partial, final)
                return final
        except urllib.error.HTTPError as e:
            if e.code not in RETRYABLE_STATUS or attempt >= retries:
                raise
        except (
            urllib.error.URLError,
            TimeoutError,
            ConnectionError,
            http.client.HTTPException,
            ssl.SSLError,
        ):
            # Retry only NETWORK failures: URLError (connect phase),
            # TimeoutError (socket.timeout — mid-body resp.read()
            # raises it raw, unwrapped), ConnectionError (reset/aborted
            # mid-stream), HTTPException (IncompleteRead on a truncated
            # body), SSLError (e.g. SSLEOFError on a mid-body TLS
            # truncation — raised raw by resp.read(), not wrapped in
            # URLError, and never by the local .partial write path, so
            # fail-fast on filesystem errors is preserved — r6 ADVICE).
            # The previous bare ``except OSError`` also captured
            # deterministic LOCAL filesystem failures from the .partial
            # write/fsync/replace in this same try (ENOSPC, EACCES,
            # missing out_dir) and burned the whole backoff budget on
            # an error that can never succeed (r5 ADVICE) — those now
            # propagate immediately.
            if attempt >= retries:
                raise
        time.sleep(backoff_s * (2**attempt))
        attempt += 1
