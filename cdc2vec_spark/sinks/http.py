"""Shared sink-HTTP plumbing: bounded retry with exponential backoff.

The reference's sinks fail a whole pipeline batch on the first HTTP
error (qdrant.go:236-255 returns the error straight up; the pipeline
then DROPS the failed rows, pipeline.go:154-165). Our writers run inside
foreachPartition, where an uncaught error fails the Spark task and the
micro-batch retries from the checkpoint — correct but heavyweight for a
transient 503/timeout. This helper absorbs the transient class at the
request level:

- retried: network errors (URLError/timeout), HTTP 5xx, and 429
- fail-fast: any other 4xx (a malformed body never heals by resending)
- deterministic exponential backoff (0.5s, 1s, 2s, ... — no RNG), then
  the last error propagates and Spark's task retry takes over.

Safe because every request body the engine sends is idempotent: Qdrant
PUT upserts, Milvus upserts, and both delete forms converge under
at-least-once delivery (the same reason merge_batch tolerates replayed
micro-batches).
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request


def send_with_retry(
    req: "urllib.request.Request",
    timeout_s: float,
    retries: int = 3,
    backoff_s: float = 0.5,
) -> bytes:
    """Issue ``req``; on a retryable failure back off and resend up to
    ``retries`` more times. Returns the response body; raises the final
    error when attempts are exhausted or the error is not retryable."""
    attempt = 0
    while True:
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if not (e.code >= 500 or e.code == 429) or attempt >= retries:
                raise
        except (urllib.error.URLError, TimeoutError, ConnectionError):
            if attempt >= retries:
                raise
        time.sleep(backoff_s * (2**attempt))
        attempt += 1
