"""WARC/1.0 source + sink for Common-Crawl-style page archives.

The engine's working corpus format is parquet (`el/io.py`), but real
Common-Crawl data arrives as WARC: concatenated records, each a block
of CRLF-terminated headers, a blank line, ``Content-Length`` payload
bytes, and a CRLF CRLF trailer; ``response`` records carry an HTTP
response envelope whose body is the page bytes.  ``.warc.gz`` files
are *per-record* gzip members concatenated back to back (the actual
Common Crawl layout, so a range request can decompress one record);
``gzip.decompress`` handles multi-member streams natively.

Scale posture (SURVEY.md §4):
- Reading is one task per WARC file via the ``binaryFile`` source —
  a Common Crawl monthly snapshot is ~64k files of ~1 GiB, so the
  scan parallelises to the file count with zero shuffle.  binaryFile
  materialises a whole file per row and hard-caps at 2 GiB; WARC
  ingestion at larger file sizes should re-shard upstream (documented
  limit, enforced with a clear error below).
- Writing is one file per task (the classic Hadoop sink shape): the
  writer hash-repartitions by url (deterministic) and sorts within
  each partition so output bytes are stable across runs and
  parallelism levels (tested).
- Parsing is a pure per-file Python kernel inside mapInPandas — no
  per-row Python UDFs; the record scan is a linear pass over bytes.
"""

from __future__ import annotations

import gzip
import hashlib
import os
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"

# binaryFile materialises one file per row; Spark caps byte arrays at
# 2 GiB.  Refuse politely instead of an executor OOM/negative-length.
MAX_WARC_FILE_BYTES = (1 << 31) - 1


# ---------------------------------------------------------------------------
# record serialisation (writer)
# ---------------------------------------------------------------------------


def _http_envelope(html: bytes) -> bytes:
    head = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(html)).encode("ascii") + _CRLF
    )
    return head + _CRLF + html


def _record_id(url: str, date: str) -> str:
    # Deterministic record id (fixtures + tests rely on byte-stable
    # output); real crawlers use random UUIDs, which would make the
    # sink non-reproducible under retries.
    digest = hashlib.md5((url + "|" + date).encode("utf-8")).hexdigest()
    return (
        f"<urn:uuid:{digest[:8]}-{digest[8:12]}-{digest[12:16]}-"
        f"{digest[16:20]}-{digest[20:32]}>"
    )


def _warc_record(rec_type: str, headers: list[tuple[str, str]], payload: bytes) -> bytes:
    lines = [b"WARC/1.0"]
    lines.append(b"WARC-Type: " + rec_type.encode("ascii"))
    for k, v in headers:
        lines.append(k.encode("ascii") + b": " + v.encode("utf-8"))
    lines.append(b"Content-Length: " + str(len(payload)).encode("ascii"))
    return _CRLF.join(lines) + _SEP + payload + _SEP


def _response_record(url: str, date: str, html: bytes) -> bytes:
    payload = _http_envelope(html)
    return _warc_record(
        "response",
        [
            ("WARC-Target-URI", url),
            ("WARC-Date", date),
            ("WARC-Record-ID", _record_id(url, date)),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        payload,
    )


def _warcinfo_record(filename: str) -> bytes:
    payload = b"software: el-spark warc sink\r\nformat: WARC File Format 1.0\r\n"
    return _warc_record(
        "warcinfo",
        [
            ("WARC-Filename", filename),
            ("WARC-Record-ID", _record_id("warcinfo:" + filename, "")),
            ("Content-Type", "application/warc-fields"),
        ],
        payload,
    )


_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("records", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)


def write_warc(
    pages: DataFrame,
    out_dir: str,
    num_files: int = 8,
    compress: bool = True,
) -> DataFrame:
    """Sink a web_pages-shaped DataFrame (url, warc_ts, html) to WARC.

    One ``.warc[.gz]`` file per task.  Hash-repartition by url + sort
    within partition makes the produced bytes a pure function of the
    input set — independent of source partitioning (tested at
    local[8] vs local[32] via file sha256).  Returns a one-row-per-
    file summary DataFrame; trigger with an action.

    WARC-Date is written with a 'Z' suffix from session-naive values,
    so the session timezone MUST be UTC (el.conf pins it; enforced
    here because a PST-naive value stamped 'Z' would silently shift
    every date for external consumers AND break byte-determinism
    across sessions).  Null/invalid ``warc_ts`` is rejected loudly —
    WARC-Date is mandatory and a sentinel date would silently corrupt
    downstream dedup-by-latest.
    """
    tz = pages.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT"):
        raise ValueError(
            f"write_warc requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): WARC-Date is stamped 'Z' from "
            f"session-naive timestamps"
        )
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"
    cols = pages.select("url", "warc_ts", "html").repartition(num_files, "url")

    def sink(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}{ext}"
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        rows = pd.concat(parts, ignore_index=True)
        # recrawls repeat a url: date + payload tiebreakers keep the
        # in-partition order (and thus file bytes) input-order-free
        rows["__d"] = rows["warc_ts"].dt.strftime("%Y-%m-%dT%H:%M:%SZ")
        n_bad = int(rows["__d"].isna().sum())
        if n_bad:
            raise ValueError(
                f"{n_bad} rows have null/invalid warc_ts; WARC-Date "
                f"is mandatory — filter or repair upstream"
            )
        rows = rows.sort_values(
            ["url", "__d", "html"], kind="mergesort"
        ).reset_index(drop=True)
        dates = rows["__d"]
        chunks = [_warcinfo_record(name)]
        for url, date, html in zip(rows["url"], dates, rows["html"]):
            chunks.append(_response_record(url, date, bytes(html)))
        if compress:
            # per-record gzip members, the Common Crawl layout
            blob = b"".join(
                gzip.compress(c, compresslevel=6, mtime=0) for c in chunks
            )
        else:
            blob = b"".join(chunks)
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, os.path.join(out_dir, name))
        yield pd.DataFrame(
            {"file": [name], "records": [len(rows)], "bytes": [len(blob)]}
        )

    return cols.mapInPandas(sink, schema=_WRITE_SCHEMA)


# ---------------------------------------------------------------------------
# record parsing (reader)
# ---------------------------------------------------------------------------


def _parse_warc_bytes(data: bytes, source: str) -> dict[str, list]:
    """Linear scan over an uncompressed WARC byte stream.

    Yields only ``response`` records (warcinfo/request/metadata are
    skipped, like every crawl consumer does).  Malformed trailing
    garbage ends the scan instead of raising: a truncated crawl file
    should degrade to its valid prefix, not kill the job.
    """
    out: dict[str, list] = {"url": [], "warc_date": [], "html": [], "warc_file": []}
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_SEP, pos)
        if head_end < 0 or not data.startswith(b"WARC/", pos):
            break
        headers: dict[str, str] = {}
        first = True
        for line in data[pos:head_end].split(_CRLF):
            if first:
                first = False  # WARC/1.0 version line
                continue
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length + 4  # payload + CRLF CRLF trailer
        if headers.get("warc-type") != "response":
            continue
        http_end = body.find(_SEP)
        html = body[http_end + 4 :] if http_end >= 0 else body
        out["url"].append(headers.get("warc-target-uri", ""))
        out["warc_date"].append(headers.get("warc-date", ""))
        out["html"].append(html)
        out["warc_file"].append(source)
    return out


READ_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("warc_file", T.StringType(), False),
    ]
)


def _parse_files(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The ONE parse kernel, shared by the batch and streaming readers
    (so batch == stream is true by construction, not just by test).
    A file that is not actually gzip despite its name is skipped —
    same degrade-don't-kill posture as truncated records."""
    for pdf in batches:
        for fpath, length, content in zip(
            pdf["path"], pdf["length"], pdf["content"]
        ):
            if int(length) > MAX_WARC_FILE_BYTES:
                raise ValueError(
                    f"WARC file {fpath} is {length} bytes; binaryFile "
                    f"caps at {MAX_WARC_FILE_BYTES}. Re-shard upstream."
                )
            data = bytes(content)
            if fpath.endswith(".gz"):
                try:
                    data = gzip.decompress(data)  # multi-member OK
                except (OSError, EOFError):
                    continue  # mislabeled/corrupt member: skip file
            cols = _parse_warc_bytes(data, os.path.basename(fpath))
            ts = pd.to_datetime(
                pd.Series(cols.pop("warc_date"), dtype="object"),
                format="%Y-%m-%dT%H:%M:%SZ",
                errors="coerce",
            )
            yield pd.DataFrame(
                {
                    "url": cols["url"],
                    "warc_ts": ts,
                    "html": cols["html"],
                    "warc_file": cols["warc_file"],
                }
            )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC source: ``binaryFile`` scan -> per-file parse kernel.

    Returns (url, warc_ts, html, warc_file).  Pair with
    ``el.extract`` downstream exactly like the parquet source — the
    e2e test runs the full ER pipeline off a WARC ingest.  The glob
    filter matches the streaming reader's, so sidecar files in a
    crawl directory (manifests, logs) never reach the kernel.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
    )
    # project only the columns the kernel needs; binaryFile supports
    # column pruning so `content` is the only heavy read.
    return files.select("path", "length", "content").mapInPandas(
        _parse_files, schema=READ_SCHEMA
    )


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming WARC source: continuous crawl ingestion straight off
    the archive files a crawler drops into a directory.

    ``binaryFile`` is a standard file-stream source, so new
    ``.warc[.gz]`` files are discovered per micro-batch with the usual
    exactly-once file-source bookkeeping (checkpointed file log); the
    per-file parse kernel is byte-identical to the batch reader —
    tested by asserting an availableNow drain of a directory equals
    the batch read of the same directory. Compose downstream exactly
    like ``ingest_pages_stream`` (el/streaming.py): extraction and
    incremental ER are already streaming-capable."""
    # streaming file sources require an explicit schema; binaryFile's
    # is fixed by the format
    bf_schema = T.StructType(
        [
            T.StructField("path", T.StringType(), False),
            T.StructField("modificationTime", T.TimestampType(), False),
            T.StructField("length", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(bf_schema)
        .option("pathGlobFilter", "*.warc*")
        .load(path)
    )
    return files.select("path", "length", "content").mapInPandas(
        _parse_files, schema=READ_SCHEMA
    )


def warc_to_pages(warc_df: DataFrame) -> DataFrame:
    """Crawl-to-corpus bridge: turn the WARC source's (url, warc_ts,
    html) into the engine's native ``WEB_PAGES`` shape by deriving the
    two columns WARC does not carry — ``text`` via EXTRACT_SPEC v1
    (el/extract.py, the pipeline's pinned extraction) and ``lang`` via
    the stopword language-ID op (el/textops.py).

    With this, a directory of WARC files is a drop-in corpus: every
    downstream stage (hygiene gate, extraction, blocking, scoring,
    incremental ER, all tx/dd ops) runs unchanged. ``lang`` is a
    heuristic here — the native corpus carries ground truth — so the
    test asserts an accuracy floor on non-null-text pages rather than
    equality."""
    from el.extract import extract_text_udf
    from el.textops import language_id

    with_text = warc_df.withColumn("text", extract_text_udf(F.col("html")))
    tagged = language_id(with_text, text_col="text")
    return tagged.select(
        "url",
        "warc_ts",
        "html",
        "text",
        F.when(F.col("text").isNull(), F.lit("und"))
        .otherwise(F.col("pred_lang"))
        .alias("lang"),
    )
