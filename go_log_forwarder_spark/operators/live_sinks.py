"""Live sink variants (K3/K4): buffered executor-side network writers.

The gated pipeline maps splunk/gelf sinks onto parquet tables (exactly-once
via idempotent overwrite — SURVEY §2.7); this module is the LIVE variant
mirroring the reference's HEC client (internal/output/splunk/splunk.go):

- buffered writes: payloads accumulate per partition and flush as one POST
  once the buffer exceeds ``buffer_threshold`` bytes (splunk.go:179 —
  ``buffer.Len() > 100``), with a final flush at partition end
  (flush-on-shutdown, K5)
- optional gzip request compression (splunk.go:199-206) + the
  ``Authorization: Splunk <token>`` / ``Content-Type: application/json``
  headers (splunk.go:217-222)
- each flush posts ONE valid JSON array. (The reference appends whole
  marshaled arrays to the byte buffer, so a multi-batch flush posts
  ``[..][..]`` — invalid JSON; deliberately not replicated, same policy as
  the stdout drop-rest-of-batch bug.)

Delivery is AT-LEAST-ONCE: a failed POST raises, Spark retries the task,
and already-flushed buffers from the failed attempt are re-sent — the
reference has the same semantics (retry loop around Flush). Exactly-once
needs the parquet/Iceberg sink path.

``foreachPartition`` keeps everything executor-side: no driver collect, one
HTTP client per partition, buffers bounded by ``buffer_threshold``.
"""

from __future__ import annotations

import gzip as _gzip
import urllib.request

from pyspark.sql import DataFrame

DEFAULT_BUFFER_THRESHOLD = 100  # bytes, splunk.go:179


def _urllib_post(url: str, data: bytes, headers: dict[str, str]) -> int:
    req = urllib.request.Request(url, data=data, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        status = resp.status
    if not 200 <= status < 300:
        raise RuntimeError(f"HEC POST to {url} returned {status}")
    return status


def splunk_hec_sink(
    df: DataFrame,
    url: str,
    token: str = "",
    payload_col: str = "payload",
    buffer_threshold: int = DEFAULT_BUFFER_THRESHOLD,
    compress: bool = False,
    post_fn=None,
) -> None:
    """POST each partition's JSON event payloads to a Splunk HEC endpoint.

    ``df`` carries one JSON object string per row in ``payload_col``
    (built by :func:`..operators.sinks.splunk_event_col`). ``post_fn``
    (url, body bytes, headers) is injectable for tests/custom transports;
    the default is stdlib urllib. Runs as ONE action.
    """
    post = post_fn or _urllib_post
    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Splunk {token}"
    if compress:
        headers["Content-Encoding"] = "gzip"

    def handle_partition(rows) -> None:
        buf: list[bytes] = []
        buflen = 0  # BYTES, not chars — the reference thresholds bytes.Buffer.Len()

        def flush() -> None:
            nonlocal buf, buflen
            if not buf:
                return
            body = b"[" + b",".join(buf) + b"]"
            if compress:
                body = _gzip.compress(body)
            post(url, body, headers)
            buf, buflen = [], 0

        for r in rows:
            p = r[payload_col]
            if p is None:
                continue
            b = p.encode("utf-8")
            buf.append(b)
            buflen += len(b)
            if buflen > buffer_threshold:
                flush()
        flush()  # K5: flush-on-shutdown — nothing stays buffered

    df.select(payload_col).foreachPartition(handle_partition)


DEFAULT_GELF_FLUSH_MESSAGES = 100  # gelf.go:120


def gelf_tcp_sink(
    df: DataFrame,
    host: str,
    port: int,
    payload_col: str = "payload",
    flush_messages: int = DEFAULT_GELF_FLUSH_MESSAGES,
) -> None:
    """Live GELF TCP variant (K4, gelf.go:95-150): one socket per
    partition; messages buffer and flush once MORE than ``flush_messages``
    are held (gelf.go:120-124), each framed as JSON + NUL (GELF TCP
    framing); final flush + close mirrors Flush-on-Exit (K5). Same
    at-least-once caveat as :func:`splunk_hec_sink`.

    ``df`` carries one GELF JSON message per row in ``payload_col``
    (built by :func:`..operators.sinks.gelf_message_col`).
    """

    def handle_partition(rows) -> None:
        import socket

        buf: list[str] = []
        sock: socket.socket | None = None

        def flush() -> None:
            nonlocal sock
            if not buf:
                return
            if sock is None:  # connect lazily: empty partitions never dial
                sock = socket.create_connection((host, port), timeout=30)
            for m in buf:
                sock.sendall(m.encode("utf-8") + b"\x00")
            buf.clear()

        try:
            for r in rows:
                p = r[payload_col]
                if p is None:
                    continue
                buf.append(p)
                if len(buf) > flush_messages:
                    flush()
            flush()
        finally:
            if sock is not None:
                sock.close()

    df.select(payload_col).foreachPartition(handle_partition)
