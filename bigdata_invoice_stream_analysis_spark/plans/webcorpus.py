"""Web-corpus ingestion queries: WARC archives (the Common Crawl
layout) exploded into record metadata and extracted text rows through
the from-scratch ISO 28500 / RFC 7230 / RFC 3986 parsers in
operators/warc.py.

Fixture strategy follows the media queries (plans/mediaops.py): every
document keys a bounded broadcast codebook of deterministic archives
(``doc_id % K``), built by the module's own WARC/HTTP writers, so the
DuckDB oracle can recompute every output column in closed form from k
— a drift anywhere in the record framing, the gzip member splitting,
the chunked transfer decode, the charset selection, the HTML text
extraction, or the URL normalization flips the value hash.

Reference: n/a (extension surface — the reference has no web-corpus
ingestion; this is the LLM-training-data front door at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.plans.queries import query
from bigdata_invoice_stream_analysis_spark.sources.tables import load_table

_WARC_DATE = "2026-01-01T00:00:00Z"


def _record_stats_archive(k: int) -> bytes:
    """Archive k for warc_record_stats: warcinfo + request + 1+(k%3)
    responses; odd k is written with one gzip member per record (the
    splittable .warc.gz layout), even k as a bare .warc. Response
    bodies are padded to exactly B(k,j) = 320 + 32*((k+j)%4) bytes so
    block/body lengths are closed-form in the oracle; odd j responses
    use chunked transfer-coding."""
    from bigdata_invoice_stream_analysis_spark.operators.warc import (
        encode_http_response,
        encode_warc,
    )

    host = f"site{k % 4}.example.com"
    base_hdr = {
        "WARC-Date": _WARC_DATE,
        "WARC-Record-ID": f"<urn:uuid:{k:08d}>",
    }
    records = [
        ("warcinfo", {**base_hdr, "Content-Type": "application/warc-fields"},
         f"archive: {k}\r\n".encode()),
        ("request", {
            **base_hdr,
            "WARC-Target-URI": f"http://{host}/page/{k}",
            "Content-Type": "application/http; msgtype=request",
        }, f"GET /page/{k} HTTP/1.1\r\nHost: {host}\r\n\r\n".encode()),
    ]
    for j in range(1 + k % 3):
        target_body_len = 320 + 32 * ((k + j) % 4)
        base = (
            f"<html><head><title>Page {k}/{j}</title></head>"
            f"<body><p>record {k} {j}</p>"
        ).encode()
        pad = target_body_len - len(base) - len(b"</body></html>") - 7
        body = base + b"<!--" + b"x" * pad + b"-->" + b"</body></html>"
        assert len(body) == target_body_len
        status, reason = (
            (404, "Not Found") if (k + j) % 4 == 3 else (200, "OK")
        )
        records.append((
            "response", {
                **base_hdr,
                "WARC-Target-URI": f"http://{host}/page/{k}/{j}",
                "Content-Type": "application/http; msgtype=response",
            },
            encode_http_response(
                status, reason,
                {"Content-Type": "text/html; charset=utf-8"},
                body, chunked=(j % 2 == 1),
            ),
        ))
    return encode_warc(records, gzip_members=(k % 2 == 1))


@query(
    "warc_record_stats",
    oracle="""
WITH media AS (
  SELECT doc_id AS archive_id, CAST(doc_id % 12 AS INT) AS k FROM documents
),
recs AS (
  SELECT archive_id, k,
         CAST(unnest(range(3 + k % 3)) AS INT) AS record_idx
  FROM media
),
r AS (
  SELECT archive_id, k, record_idx, record_idx - 2 AS j,
         'site' || CAST(k % 4 AS VARCHAR) || '.example.com' AS host,
         CASE WHEN record_idx >= 2 AND (k + record_idx - 2) % 4 = 3
              THEN 404 ELSE 200 END AS status,
         320 + 32 * ((k + record_idx - 2) % 4) AS b
  FROM recs
)
SELECT archive_id, record_idx,
  CASE record_idx WHEN 0 THEN 'warcinfo' WHEN 1 THEN 'request'
       ELSE 'response' END AS rec_type,
  CASE WHEN record_idx = 0 THEN NULL
       WHEN record_idx = 1
       THEN 'http://' || host || '/page/' || CAST(k AS VARCHAR)
       ELSE 'http://' || host || '/page/' || CAST(k AS VARCHAR)
            || '/' || CAST(j AS VARCHAR) END AS target_uri,
  '2026-01-01T00:00:00Z' AS warc_date,
  CASE record_idx WHEN 0 THEN 'application/warc-fields'
       WHEN 1 THEN 'application/http; msgtype=request'
       ELSE 'application/http; msgtype=response' END AS content_type,
  CAST(CASE WHEN record_idx = 0 THEN 11 + length(CAST(k AS VARCHAR))
            WHEN record_idx = 1 THEN 48 + length(CAST(k AS VARCHAR))
            ELSE CASE WHEN status = 200 THEN 15 ELSE 22 END
                 + CASE WHEN j % 2 = 1 THEN 77 + 22 * (b // 16)
                        ELSE 65 + b END
       END AS BIGINT) AS block_len,
  CAST(CASE WHEN record_idx >= 2 THEN status END AS INT) AS http_status,
  CASE WHEN record_idx >= 2 THEN 'text/html' END AS http_mime,
  CAST(CASE WHEN record_idx >= 2 THEN b END AS BIGINT) AS body_len
FROM r
""",
)
def q_warc_record_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC triage — the metadata pass a web-corpus pipeline runs over
    every archive BEFORE extracting any text (filter on record type /
    HTTP status / mime, size the corpus). Every doc maps to an archive
    from a bounded 12-payload broadcast codebook keyed by doc_id % 12:
    archive k holds a warcinfo record (block ``archive: k``), a request
    record, and 1+(k%3) HTTP responses whose bodies are padded to
    exactly 320+32·((k+j)%4) bytes — odd-j responses use RFC 7230 §4.1
    chunked transfer-coding (22·(B/16)+5 framing bytes, B a multiple
    of 32), and odd-k archives are written one-gzip-member-per-record
    (the layout that makes .warc.gz splittable at 100 TB). Executors
    split members, frame records by Content-Length, parse the HTTP
    status/headers and de-frame the body (operators/warc.warc_records);
    the closed-form oracle recomputes every length from k, so a drift
    in the record framing, the gzip splitter, or the chunked decode
    flips the hash. Plan: 12-row broadcast join + map-side parse, zero
    data shuffle."""
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.operators.warc import (
        warc_records,
    )

    ensure_package_on_workers(spark)
    d = load_table(spark, sf_dir, "documents")
    codebook = spark.createDataFrame(
        [(k, bytearray(_record_stats_archive(k))) for k in range(12)],
        "k int, payload binary",
    )
    archives = d.select(
        F.col("doc_id").alias("archive_id"),
        (F.col("doc_id") % 12).cast("int").alias("k"),
    ).join(F.broadcast(codebook), "k")
    return warc_records(archives.select("archive_id", "payload"))


def _text_corpus_archive(k: int) -> bytes:
    """Archive k for warc_text_corpus: warcinfo + request + 1+(k%2)
    HTML 200 responses the extractor keeps, then (k%5==0) a 404 and
    (k%3==0) a text/plain response it must drop. Odd k declares and
    encodes ISO-8859-1 (the é exercises the charset switch), even k
    UTF-8; archives with k%3==1 are chunked; odd k gzip-membered."""
    from bigdata_invoice_stream_analysis_spark.operators.warc import (
        encode_http_response,
        encode_warc,
    )

    raw_host = (
        "News.BBC.co.UK" if k % 4 == 3
        else f"Site{k % 4}.Example.COM"
    )
    base_hdr = {
        "WARC-Date": _WARC_DATE,
        "WARC-Record-ID": f"<urn:uuid:{k:08d}>",
    }
    charset, enc = (
        ("ISO-8859-1", "latin-1") if k % 2 == 1 else ("utf-8", "utf-8")
    )
    chunked = k % 3 == 1
    records = [
        ("warcinfo", {**base_hdr, "Content-Type": "application/warc-fields"},
         f"archive: {k}\r\n".encode()),
        ("request", {
            **base_hdr,
            "WARC-Target-URI": f"http://{raw_host}/p/{k}",
            "Content-Type": "application/http; msgtype=request",
        }, f"GET /p/{k} HTTP/1.1\r\n\r\n".encode()),
    ]
    for j in range(1 + k % 2):
        html = (
            f"<html><head><title>Site {k} &amp; page {j}</title>"
            f"<style>p {{color: red}}</style></head>"
            f"<body><!-- meta {k} --><h1>Header {k}</h1>"
            f'<script type="text/javascript">var n = {k};</script>'
            f'<p>Linked to <a href="/a/{j}">c {j}</a> and '
            f"<a href='/b/{k}'>d</a>.</p>"
            f"<p>Caf&eacute; {k} &lt;net&gt; &#233;l&#xE8;ve.</p>"
            f"</body></html>"
        )
        records.append((
            "response", {
                **base_hdr,
                "WARC-Target-URI": (
                    f"HTTP://{raw_host}:80/p/{k}/../{k}/page%7E{j}?x={k}"
                ),
                "Content-Type": "application/http; msgtype=response",
            },
            encode_http_response(
                200, "OK",
                {"Content-Type": f"text/html; charset={charset}"},
                html.encode(enc), chunked=chunked,
            ),
        ))
    if k % 5 == 0:
        records.append((
            "response", {
                **base_hdr,
                "WARC-Target-URI": f"http://{raw_host}/gone/{k}",
                "Content-Type": "application/http; msgtype=response",
            },
            encode_http_response(
                404, "Not Found", {"Content-Type": "text/html"},
                b"<html><body>gone</body></html>",
            ),
        ))
    if k % 3 == 0:
        records.append((
            "response", {
                **base_hdr,
                "WARC-Target-URI": f"http://{raw_host}/robots.txt",
                "Content-Type": "application/http; msgtype=response",
            },
            encode_http_response(
                200, "OK", {"Content-Type": "text/plain"},
                f"plain {k}".encode(),
            ),
        ))
    return encode_warc(records, gzip_members=(k % 2 == 1))


@query(
    "warc_text_corpus",
    oracle="""
WITH media AS (
  SELECT doc_id AS archive_id, CAST(doc_id % 10 AS INT) AS k FROM documents
),
recs AS (
  SELECT archive_id, k, CAST(unnest(range(1 + k % 2)) AS INT) AS j
  FROM media
),
v AS (
  SELECT archive_id, k, j,
    CASE WHEN k % 4 = 3 THEN 'News.BBC.co.UK'
         ELSE 'Site' || CAST(k % 4 AS VARCHAR) || '.Example.COM'
    END AS raw_host,
    CASE WHEN k % 4 = 3 THEN 'news.bbc.co.uk'
         ELSE 'site' || CAST(k % 4 AS VARCHAR) || '.example.com'
    END AS lhost,
    CASE WHEN k % 4 = 3 THEN 'bbc.co.uk' ELSE 'example.com' END AS dom
  FROM recs
),
t AS (
  SELECT *,
    'Site ' || CAST(k AS VARCHAR) || ' & page ' || CAST(j AS VARCHAR)
      AS title,
    'Site ' || CAST(k AS VARCHAR) || ' & page ' || CAST(j AS VARCHAR)
      || ' Header ' || CAST(k AS VARCHAR)
      || ' Linked to c ' || CAST(j AS VARCHAR) || ' and d . Café '
      || CAST(k AS VARCHAR) || ' <net> élève.' AS text
  FROM v
)
SELECT archive_id, CAST(2 + j AS INT) AS record_idx,
  'HTTP://' || raw_host || ':80/p/' || CAST(k AS VARCHAR) || '/../'
    || CAST(k AS VARCHAR) || '/page%7E' || CAST(j AS VARCHAR)
    || '?x=' || CAST(k AS VARCHAR) AS url,
  'http://' || lhost || '/p/' || CAST(k AS VARCHAR) || '/page~'
    || CAST(j AS VARCHAR) || '?x=' || CAST(k AS VARCHAR)
    AS normalized_url,
  dom AS domain,
  CAST(200 AS INT) AS http_status,
  CASE WHEN k % 2 = 1 THEN 'iso-8859-1' ELSE 'utf-8' END AS charset,
  title, text,
  CAST(length(text) AS INT) AS text_len,
  CAST(2 AS INT) AS n_links
FROM t
""",
)
def q_warc_text_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC → text-corpus extraction — the full ingestion pass that
    turns captured HTTP traffic into the (url, domain, title, text)
    table every downstream dedup/quality/langid stage consumes. Every
    doc maps to an archive from a bounded 10-payload broadcast codebook
    keyed by doc_id % 10: archive k carries 1+(k%2) keepable HTML 200
    responses (odd k declared AND encoded ISO-8859-1 with an é that
    separates the charsets byte-wise, even k UTF-8; k%3==1 chunked;
    odd k gzip-membered) plus records the extractor must DROP — the
    warcinfo/request records, a 404 page when k%5==0, a text/plain
    response when k%3==0. The target URIs are deliberately
    un-normalized (uppercase scheme/host, explicit :80, /../ dot
    segment, %7E for ~) and one host family sits under a two-label
    public suffix (bbc.co.uk). Executors parse, filter, extract
    (comment/script/style removal, entity decode incl. numeric forms,
    tag strip, whitespace collapse) and normalize per RFC 3986 §6.2
    (operators/warc.warc_text_corpus); the closed-form oracle
    reconstructs the exact extracted strings from k, so a drift in the
    entity table, the tag stripper, the charset fallback, or the
    dot-segment algorithm flips the hash. Plan: 10-row broadcast join
    + map-side parse, zero data shuffle."""
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.operators.warc import (
        warc_text_corpus,
    )

    ensure_package_on_workers(spark)
    d = load_table(spark, sf_dir, "documents")
    codebook = spark.createDataFrame(
        [(k, bytearray(_text_corpus_archive(k))) for k in range(10)],
        "k int, payload binary",
    )
    archives = d.select(
        F.col("doc_id").alias("archive_id"),
        (F.col("doc_id") % 10).cast("int").alias("k"),
    ).join(F.broadcast(codebook), "k")
    return warc_text_corpus(archives.select("archive_id", "payload"))


@query(
    "warc_corpus_funnel",
    oracle="""
WITH media AS (
  SELECT doc_id AS archive_id, CAST(doc_id % 10 AS INT) AS k FROM documents
),
recs AS (
  SELECT archive_id, k, CAST(unnest(range(1 + k % 2)) AS INT) AS j
  FROM media
),
v AS (
  SELECT archive_id, k, j,
    CASE WHEN k % 4 = 3 THEN 'bbc.co.uk' ELSE 'example.com' END AS dom
  FROM recs
),
t AS (
  SELECT *,
    'Site ' || CAST(k AS VARCHAR) || ' & page ' || CAST(j AS VARCHAR)
      || ' Header ' || CAST(k AS VARCHAR)
      || ' Linked to c ' || CAST(j AS VARCHAR) || ' and d . Café '
      || CAST(k AS VARCHAR) || ' <net> élève.' AS text
  FROM v
),
ranked AS (
  SELECT archive_id, 2 + j AS record_idx, dom AS domain, text,
         length(text) AS text_len,
         row_number() OVER (
           PARTITION BY text ORDER BY archive_id, 2 + j
         ) AS rnk
  FROM t
)
SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
  CAST(SUM(text_len) AS BIGINT) AS total_text_len,
  ROUND(1 - CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*), 6) AS dup_rate
FROM ranked GROUP BY domain
""",
)
def q_warc_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END ingestion funnel a real web-corpus build runs,
    composed entirely from graded pieces — warc_text_corpus extraction
    → exact text dedup (first (archive_id, record_idx) per distinct
    text wins, the r02-graded exact_dedup_groups shape) → per-domain
    corpus stats (docs, survivors, dup rate, total text bytes).
    Shape: map-side extraction (zero shuffles) → ONE window shuffle on
    the text key → one partial-agg shuffle on domain; at 100 TB those
    are the two shuffles a corpus build must pay and the only two this
    plan contains. The closed-form oracle recomputes the funnel in SQL
    from the same codebook arithmetic as warc_text_corpus (the
    extracted text is a pure function of (k, j)), so a drift in the
    extraction, the survivor rule, or the per-domain rollup flips the
    hash."""
    from pyspark.sql import Window

    rows = q_warc_text_corpus(spark, sf_dir)
    w = Window.partitionBy("text").orderBy("archive_id", "record_idx")
    survivors = (
        rows.withColumn("rank", F.row_number().over(w))
        .withColumn("is_survivor", F.col("rank") == 1)
    )
    return (
        survivors.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("is_survivor").cast("long")).alias("n_unique"),
            F.sum("text_len").alias("total_text_len"),
        )
        .withColumn(
            "dup_rate",
            F.round(1 - F.col("n_unique") / F.col("n_docs"), 6),
        )
    )
