"""HTTP egress sinks (SURVEY §2.1 K7 Google Analytics measurement
protocol, K8 Facebook Conversions API).

Reference parity:
- GA sends one GET per event to ``/collect`` with url-encoded params:
  ``tid`` (tracking id), ``v=1``, every event field stringified, and the
  ``t`` event type mapped through a fixed table with a default of
  "event" (server/adapters/google_analytics.go:76-118).
- FB posts JSON batches to ``graph.facebook.com/v<api>/<pixel>/events``
  with ``action_source`` defaulting to "website", ``event_time`` =
  unix(_timestamp), ``event_name`` mapped, and user_data PII sha256-
  hashed before egress (server/adapters/facebook_conversion_api.go:
  150-230, hashFields).

Ray-first shape: an actor-pool ``map_batches`` stage — connection/
config built once per actor, per-batch token-bucket rate limiting so
N actors respect an aggregate requests/sec budget, errors classified
transient (5xx, connection) vs permanent (4xx) for sinks/retry's
backoff + dead-letter fallback. Tests drive a local stub HTTP server
(the container has no network).
"""

from __future__ import annotations

import hashlib
import json
import time
import urllib.error
import urllib.parse
import urllib.request
from datetime import datetime

import pyarrow as pa

from .retry import PermanentSinkError, TransientSinkError

GA_EVENT_TYPE_MAPPING = {
    "pageview": "pageview",
    "screenview": "screenview",
    "event": "event",
    "conversion": "transaction",
    "transaction": "transaction",
    "item": "item",
    "social": "social",
    "exception": "exception",
    "timing": "timing",
}
GA_DEFAULT_EVENT_TYPE = "event"

FB_EVENT_NAME_MAPPING = {
    "page": "PageView",
    "pageview": "PageView",
    "app_page": "PageView",
    "conversion": "Purchase",
    "signup": "CompleteRegistration",
}
# user_data fields hashed before egress (FB requires sha256 of em/ph/...)
FB_HASH_FIELDS = ["em", "ph", "ge", "db", "ln", "fn", "ct", "st", "zp", "country"]


def ga_params(row: dict, tracking_id: str) -> str:
    """One event -> /collect query string (google_analytics.go:76-99)."""
    uv = [("tid", tracking_id), ("v", "1")]
    for k in sorted(row):
        v = row[k]
        if v is None:
            continue
        s = v if isinstance(v, str) else str(v)
        if k == "t":
            s = GA_EVENT_TYPE_MAPPING.get(s, GA_DEFAULT_EVENT_TYPE)
        uv.append((k, s))
    return urllib.parse.urlencode(uv)


def fb_payload(rows: list[dict]) -> dict:
    """Event rows -> Conversions API body (facebook_conversion_api.go:
    150-230): action_source default, event_time from _timestamp,
    event_name mapping, user_data PII sha256-hashed."""
    data = []
    for row in rows:
        obj = {k: v for k, v in row.items() if v is not None}
        obj.setdefault("action_source", "website")
        ts = obj.pop("_timestamp", None)
        if ts is None:
            raise PermanentSinkError("object doesn't have _timestamp system field")
        if isinstance(ts, datetime):
            obj["event_time"] = int(ts.timestamp())
        else:
            obj["event_time"] = int(ts)
        name = obj.get("event_name")
        if name is None:
            raise PermanentSinkError("object doesn't have event_name")
        obj["event_name"] = FB_EVENT_NAME_MAPPING.get(str(name), str(name))
        user = obj.get("user_data")
        if isinstance(user, dict):
            hashed = dict(user)
            for f in FB_HASH_FIELDS:
                v = hashed.get(f)
                if v is not None and not _looks_hashed(str(v)):
                    hashed[f] = hashlib.sha256(str(v).strip().lower().encode()).hexdigest()
            obj["user_data"] = hashed
        data.append(obj)
    return {"data": data}


def _looks_hashed(v: str) -> bool:
    return len(v) == 64 and all(c in "0123456789abcdef" for c in v)


class _TokenBucket:
    def __init__(self, rate_per_sec: float):
        if rate_per_sec <= 0:
            raise ValueError("rate_per_sec must be > 0")
        self.rate = rate_per_sec
        # burst cap must admit at least one whole token or sub-1/s
        # rates (an aggregate budget divided across actors) never fire
        self.cap = max(rate_per_sec, 1.0)
        self.allowance = self.cap
        self.last = time.monotonic()

    def acquire(self) -> None:
        while True:
            now = time.monotonic()
            self.allowance = min(self.cap, self.allowance + (now - self.last) * self.rate)
            self.last = now
            if self.allowance >= 1.0:
                self.allowance -= 1.0
                return
            time.sleep((1.0 - self.allowance) / self.rate)


def _classify_status(code: int, body: str) -> Exception:
    if 500 <= code or code == 429:
        return TransientSinkError(f"HTTP {code}: {body[:200]}")
    return PermanentSinkError(f"HTTP {code}: {body[:200]}")


class GoogleAnalyticsEgress:
    """Actor-pool stage: one GET per event row against the measurement
    protocol endpoint, rate-limited per actor (divide the aggregate
    budget by ``concurrency`` when constructing)."""

    def __init__(self, endpoint: str, tracking_id: str, rate_per_sec: float = 50.0,
                 timeout_sec: float = 5.0):
        self.endpoint = endpoint.rstrip("/")
        self.tracking_id = tracking_id
        self.bucket = _TokenBucket(rate_per_sec)
        self.timeout = timeout_sec

    def __call__(self, batch: pa.Table) -> pa.Table:
        # row-wise delivery: report partial progress on failure so the
        # retry stage resumes from the first unsent row (no duplicate
        # GETs for rows already delivered in this attempt)
        sent = 0
        try:
            for row in batch.to_pylist():
                self.bucket.acquire()
                url = f"{self.endpoint}/collect?{ga_params(row, self.tracking_id)}"
                _do_request(url, method="GET", timeout=self.timeout)
                sent += 1
        except Exception as e:  # noqa: BLE001 — sink boundary
            e.rows_sent = sent
            raise
        return batch

    def write_batch(self, batch: pa.Table) -> None:
        self(batch)


class FacebookConversionEgress:
    """Actor-pool stage: one JSON POST per batch (the API takes event
    arrays), PII hashed, rate-limited per actor."""

    def __init__(self, endpoint: str, pixel_id: str, token: str = "",
                 rate_per_sec: float = 10.0, timeout_sec: float = 5.0):
        self.url = f"{endpoint.rstrip('/')}/{pixel_id}/events"
        self.token = token
        self.bucket = _TokenBucket(rate_per_sec)
        self.timeout = timeout_sec

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        if rows:
            self.bucket.acquire()
            body = fb_payload(rows)
            if self.token:
                body["access_token"] = self.token
            _do_request(
                self.url,
                method="POST",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
                timeout=self.timeout,
            )
        return batch

    def write_batch(self, batch: pa.Table) -> None:
        self(batch)


def _do_request(url: str, method: str, timeout: float, data: bytes | None = None,
                headers: dict | None = None) -> None:
    req = urllib.request.Request(url, method=method, data=data, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if resp.status != 200:
                raise _classify_status(resp.status, "")
    except urllib.error.HTTPError as e:
        raise _classify_status(e.code, e.read().decode(errors="replace")) from e
    except urllib.error.URLError as e:
        raise TransientSinkError(f"connection error: {e.reason}") from e


def egress_with_retry(ds, stage, failed_dir: str | None = None, max_attempts: int = 3,
                      backoff_sec: float = 0.05, batch_size: int = 256) -> dict:
    """Drive a Dataset into an egress stage through the retry/backoff +
    dead-letter machinery (sinks/retry). ``stage`` is a constructed
    GoogleAnalyticsEgress / FacebookConversionEgress (or anything with
    ``write_batch``)."""
    from .retry import sink_with_retry

    return sink_with_retry(
        ds,
        stage.write_batch,
        failed_dir=failed_dir,
        max_attempts=max_attempts,
        backoff_sec=backoff_sec,
        concurrency=1,
        batch_size=batch_size,
    )
