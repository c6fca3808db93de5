"""HTTP response parsing + HTML text extraction — the crawl→text step.

A WARC ``response`` record's payload is an HTTP message, and the first
real operation of every pretraining pipeline is crawl→text: parse the
HTTP envelope (status, headers), keep the 200s, strip the HTML down to
prose. This module implements that step dependency-free:

- :func:`parse_http_response` — status line + header block + body split
  per RFC 9112 framing (CRLF header block, case-insensitive names);
  malformed envelopes raise ``ValueError`` (the quarantine convention).
- :func:`html_to_text` — tag stripping with the semantics that matter
  for corpus quality: ``<script>``/``<style>`` blocks are dropped WITH
  their contents (js/css must never leak into training text), comments
  removed, block-level tags become newlines so words don't fuse across
  paragraphs, the core entities (&amp; &lt; &gt; &quot; &#39; &nbsp;)
  decode, and whitespace collapses. This is the honest regex tier —
  production extractors (trafilatura/resiliparse) add boilerplate
  removal; the mapInPandas seam is the documented swap-in point, same
  as the image codecs.
- :func:`extract_title` — the ``<title>`` text, the one metadata field
  every downstream dedup/quality table keys on.

The ``warc_html_text_pipeline`` query runs the full flow END-TO-END:
planted archives → Python DataSource scan → HTTP parse → status gate →
HTML extraction → per-archive token accounting, all oracle-checked.

Reference behavior modeled: none (SURVEY §2.10 — the reference is a
SQL warehouse); training-data-pipeline extension surface.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.registry import register

_CRLF = b"\r\n"

_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.I | re.S)
_HEAD_RE = re.compile(r"<head\b[^>]*>.*?</head\s*>", re.I | re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_BLOCK_TAG_RE = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|header"
    r"|footer|blockquote|pre)\b[^>]*>",
    re.I,
)
_TAG_RE = re.compile(r"<[^>]+>")
_TITLE_RE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>", re.I | re.S)

_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">",
    "&quot;": '"', "&#39;": "'", "&nbsp;": " ",
}


def parse_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split an HTTP/1.x response into (status_code, headers, body).
    Raises ``ValueError`` on a malformed status line or an unterminated
    header block — the quarantine signal."""
    head_end = payload.find(_CRLF + _CRLF)
    if head_end < 0:
        raise ValueError("malformed HTTP: unterminated header block")
    lines = payload[:head_end].split(_CRLF)
    parts = lines[0].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError("malformed HTTP: bad status line")
    try:
        status = int(parts[1])
    except ValueError as exc:
        raise ValueError("malformed HTTP: non-numeric status") from exc
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    return status, headers, payload[head_end + 4 :]


def html_to_text(html: str) -> str:
    """Strip HTML to prose: script/style dropped with contents, comments
    and the whole <head> block removed (metadata is not prose — the
    title is surfaced separately by :func:`extract_title`), block tags
    → newline (words never fuse across paragraphs),
    remaining tags removed, core entities decoded, whitespace collapsed
    (spaces within lines, single newlines between blocks)."""
    s = _HEAD_RE.sub(" ", html)  # metadata, not prose (title via extract_title)
    s = _SCRIPT_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES.items():
        s = s.replace(ent, ch)
    lines = [" ".join(ln.split()) for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_title(html: str) -> str:
    """The <title> content, entity-decoded and whitespace-collapsed;
    empty string when absent."""
    m = _TITLE_RE.search(html)
    if not m:
        return ""
    t = _TAG_RE.sub(" ", m.group(1))
    for ent, ch in _ENTITIES.items():
        t = t.replace(ent, ch)
    return " ".join(t.split())


# ---------------------------------------------------------------------------
# End-to-end crawl→text pipeline over the WARC source
# ---------------------------------------------------------------------------

_PIPE_SCHEMA = (
    "source_file string, n_200 long, n_404 long, n_docs long, "
    "sum_tokens bigint, sum_title_chars bigint, checksum_text bigint"
)

#: words per planted page body: 5 + (f*3 + r) % 11
_WORDS = "(5 + (f * 3 + r) % 11)"


def _planted_http_html(f: int, r: int) -> bytes:
    """Deterministic HTTP+HTML payload for (archive f, record r): every
    3rd page is a 404; bodies carry a known word count wrapped in the
    markup classes the extractor must survive (script with angle
    brackets in strings, comments, entities, nested inline tags)."""
    if (f + r) % 3 == 2:
        return (
            b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n"
            b"<html><body><p>gone</p></body></html>"
        )
    nw = 5 + (f * 3 + r) % 11
    words = " ".join(f"w{f}x{r}x{i}" for i in range(nw))
    html = (
        f"<html><!-- c{f} --><head><title>Doc {f}:{r} &amp; co</title>"
        f"<style>p {{ color: red }}</style></head>"
        f"<body><script>if (1 < 2) {{ junk(); }}</script>"
        f"<p>{words}</p><div>&nbsp;</div></body></html>"
    )
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + html.encode()
    )


@register(
    "warc_html_text_pipeline",
    oracle=f"""
    WITH recs AS (
        SELECT f, r FROM range(0, 6) a(f) CROSS JOIN range(0, 9) b(r)
    ),
    pages AS (
        SELECT f, r,
               (f + r) % 3 = 2 AS is_404,
               {_WORDS} AS nw
        FROM recs
    )
    SELECT 'part-' || lpad(CAST(f AS VARCHAR), 4, '0') || '.warc'
               || (CASE WHEN f % 2 = 1 THEN '.gz' ELSE '' END) AS source_file,
           CAST(sum(CASE WHEN is_404 THEN 0 ELSE 1 END) AS BIGINT) AS n_200,
           CAST(sum(CASE WHEN is_404 THEN 1 ELSE 0 END) AS BIGINT) AS n_404,
           CAST(sum(CASE WHEN is_404 THEN 0 ELSE 1 END) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN is_404 THEN 0 ELSE nw END) AS BIGINT)
               AS sum_tokens,
           -- title 'Doc f:r & co': 10 fixed chars + digits of f and r
           CAST(sum(CASE WHEN is_404 THEN 0
                         ELSE 10 + length(CAST(f AS VARCHAR))
                              + length(CAST(r AS VARCHAR)) END) AS BIGINT)
               AS sum_title_chars,
           -- body text: words 'wFxRxI' joined by single spaces (head,
           -- script, style, comments, entities all gone); 404 pages
           -- extract to 'gone' (4 chars)
           CAST(sum(CASE WHEN is_404 THEN 4
                    ELSE list_sum(list_transform(range(0, nw),
                             i -> 3 + length(CAST(f AS VARCHAR))
                                  + length(CAST(r AS VARCHAR))
                                  + length(CAST(i AS VARCHAR))))
                         + nw - 1 END) AS BIGINT)
               AS checksum_text
    FROM pages
    GROUP BY 1
    """,
    doc="END-TO-END crawl→text: planted HTTP+HTML payloads ride real "
    "WARC archives, scan through the Python DataSource, HTTP-parse "
    "(status gate: 404s counted, only 200s extracted), and the HTML "
    "extractor must drop script/style WITH contents (a script body "
    "containing '1 < 2' — the case naive tag-regexes corrupt), strip "
    "comments/tags, decode entities, and collapse whitespace; token "
    "counts, title lengths, and exact extracted-text lengths match the "
    "arithmetic oracle.",
)
def warc_html_text_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the whole flow is partition-parallel — archive-grain scan
    partitions, Arrow-batched parse+extract kernel, one shuffle at the
    archive grain for the rollup. Swapping the planted landing zone for
    a real crawl bucket and the regex tier for trafilatura changes two
    lines, not the plan."""
    import os

    from etl_loading_scripts_spark.sources.warc import (
        _fixture_dir,
        build_warc_record,
        register_warc_source,
        write_warc,
    )

    register_warc_source(spark)
    d = _fixture_dir(sf_dir) + "_http"
    os.makedirs(d, exist_ok=True)
    for f in range(6):
        gz = f % 2 == 1
        name = f"part-{f:04d}.warc" + (".gz" if gz else "")
        records = [
            build_warc_record(
                "response",
                f"http://example.org/{f}/{r}",
                "2026-01-01T00:00:00Z",
                "application/http; msgtype=response",
                _planted_http_html(f, r),
            )
            for r in range(9)
        ]
        write_warc(os.path.join(d, name), records, gzip_members=gz)

    raw = spark.read.format("warc").option("pushdown", "true").load(d)
    responses = raw.filter(F.col("warc_type") == "response")

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for src, payload in zip(pdf["source_file"], pdf["payload"]):
                status, _headers, body = parse_http_response(bytes(payload))
                html = body.decode("utf-8", errors="replace")
                if status != 200:
                    rows.append((src, 0, 1 if status == 404 else 0, 0, 0, 0, 4))
                    continue
                text = html_to_text(html)
                title = extract_title(html)
                rows.append((
                    src, 1, 0, 1,
                    len(text.split()), len(title), len(text),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "source_file", "n_200", "n_404", "n_docs",
                    "sum_tokens", "sum_title_chars", "checksum_text",
                ],
            )

    per_doc = responses.mapInPandas(extract, schema=_PIPE_SCHEMA)
    return per_doc.groupBy("source_file").agg(
        F.sum("n_200").cast("long").alias("n_200"),
        F.sum("n_404").cast("long").alias("n_404"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_tokens").cast("long").alias("sum_tokens"),
        F.sum("sum_title_chars").cast("long").alias("sum_title_chars"),
        F.sum("checksum_text").cast("long").alias("checksum_text"),
    )


@register(
    "stream_warc_crawl_ingest",
    oracle=f"""
    WITH recs AS (
        SELECT f, r FROM range(0, 6) a(f) CROSS JOIN range(0, 9) b(r)
    ),
    pages AS (
        SELECT f, r, (f + r) % 3 = 2 AS is_404, {_WORDS} AS nw FROM recs
    )
    SELECT 'part-' || lpad(CAST(f AS VARCHAR), 4, '0') || '.warc'
               || (CASE WHEN f % 2 = 1 THEN '.gz' ELSE '' END) AS source_file,
           CAST(sum(CASE WHEN is_404 THEN 0 ELSE 1 END) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN is_404 THEN 0 ELSE nw END) AS BIGINT)
               AS sum_tokens
    FROM pages
    GROUP BY 1
    """,
    doc="STREAMING crawl ingest: the same planted archives flow through "
    "spark.readStream.format('warc') (landing-zone reader, file-list "
    "offsets) into the Arrow-batched HTTP-parse + HTML-extract kernel "
    "and a complete-mode rollup; the DuckDB oracle is the BATCH "
    "arithmetic — streaming execution must converge to exactly the "
    "batch answer (processAllAvailable), which pins the micro-batch "
    "path's parity, not just its liveness.",
)
def stream_warc_crawl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the landing-zone reader ingests per new archive; parse +
    extraction are partition-parallel mapInPandas inside each
    micro-batch; the rollup keeps one state row per archive. The same
    topology runs continuously on a real crawl bucket with the memory
    sink swapped for a lakehouse table via foreachBatch."""
    import uuid as _uuid

    from etl_loading_scripts_spark.sources.warc import (
        _fixture_dir,
        register_warc_source,
    )

    register_warc_source(spark)
    # reuse (or create) the batch query's planted landing zone
    import os

    d = _fixture_dir(sf_dir) + "_http"
    if not os.path.isdir(d) or not os.listdir(d):
        # plant via the batch query's fixture writer
        from etl_loading_scripts_spark.sources.warc import (
            build_warc_record,
            write_warc,
        )

        os.makedirs(d, exist_ok=True)
        for f in range(6):
            gz = f % 2 == 1
            name = f"part-{f:04d}.warc" + (".gz" if gz else "")
            records = [
                build_warc_record(
                    "response", f"http://example.org/{f}/{r}",
                    "2026-01-01T00:00:00Z",
                    "application/http; msgtype=response",
                    _planted_http_html(f, r),
                )
                for r in range(9)
            ]
            write_warc(os.path.join(d, name), records, gzip_members=gz)

    stream = spark.readStream.format("warc").load(d)

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for src, payload in zip(pdf["source_file"], pdf["payload"]):
                status, _h, body = parse_http_response(bytes(payload))
                if status != 200:
                    continue
                text = html_to_text(body.decode("utf-8", errors="replace"))
                rows.append((src, 1, len(text.split())))
            yield pd.DataFrame(
                rows, columns=["source_file", "n_docs", "sum_tokens"]
            )

    extracted = stream.filter(F.col("warc_type") == "response").mapInPandas(
        extract, schema="source_file string, n_docs long, sum_tokens long"
    )
    agg = extracted.groupBy("source_file").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_tokens").cast("long").alias("sum_tokens"),
    )
    sink = f"crawl_out_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(sink)
