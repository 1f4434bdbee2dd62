"""RSS/Atom feed source (reference S1/S2, X1).

Reference: ``read_feeders`` reads the config worksheet, normalizes headers,
validates required columns and builds Feeder rows (core/etl.py:74-106);
``parse_feed`` HTTP-fetches each feed sequentially and parses entries with
feedparser, cleans HTML summaries, parses+tz-converts timestamps, defaults
a missing published to now (core/etl.py:108-169).

Spark shape: the feed config is a small DataFrame; fetching/parsing runs
INSIDE ``mapInPandas`` over that config — each executor task fetches its
partition of feeds in parallel (the reference's sequential per-feed loop
becomes free fan-out), emitting stage-schema rows.  The fetcher is
injectable: production uses urllib; tests and the offline driver inject a
deterministic stub, keeping network effects out of the correctness-checked
core (SURVEY §7.3).  Feed XML is parsed with stdlib ElementTree (RSS 2.0 +
Atom), since feedparser is not available in this environment.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import REQUIRED_FEED_CONFIG_COLS, assert_required_columns, normalize_column_names

Fetcher = Callable[[str], str]  # url -> raw XML


@dataclass
class Feeder:
    """One feed config row (reference models/feeder.py:8-25)."""

    title: str
    reader: str
    time: str
    url: str
    worksheet_name: str
    job_title: str | None = None

    @property
    def effective_job_title(self) -> str:
        # job_title falls back to title (core/etl.py:104)
        return self.job_title or self.title


def read_feeders(config_df: DataFrame) -> list[Feeder]:
    """Validate + normalize the config table into Feeder rows (S2).

    The config is small by construction (tens of feeds) — collecting it to
    the driver is the correct plan; it then broadcasts implicitly as task
    data for the fetch stage.
    """
    df = normalize_column_names(config_df)
    assert_required_columns(df, REQUIRED_FEED_CONFIG_COLS)
    feeders = []
    for row in df.collect():
        url = (row["url"] or "").strip()
        ws = (row["worksheet_name"] or "").strip()
        if not url or not ws:  # blank url/worksheet rows skipped (rss_feed_etl.py:56-61)
            continue
        feeders.append(
            Feeder(
                title=(row["title"] or "").strip(),
                reader=(row["reader"] or "").strip(),
                time=(row["time"] or "").strip(),
                url=url,
                worksheet_name=ws,
                job_title=(row["job_title"] or "").strip() or None
                if "job_title" in df.columns
                else None,
            )
        )
    return feeders


def parse_feed_xml(raw: str) -> list[dict]:
    """Parse RSS 2.0 / Atom XML into entry dicts (pure, deterministic)."""
    import xml.etree.ElementTree as ET

    entries: list[dict] = []
    try:
        root = ET.fromstring(raw)
    except ET.ParseError:
        return entries

    def text(el, *names):
        for n in names:
            found = el.find(n)
            if found is not None and found.text:
                return found.text.strip()
        return ""

    atom = "{http://www.w3.org/2005/Atom}"
    feed_title = ""
    if root.tag == "rss" or root.tag.endswith("rss"):
        chan = root.find("channel")
        if chan is None:
            return entries
        feed_title = text(chan, "title")
        for item in chan.findall("item"):
            entries.append(
                {
                    "entry_title": text(item, "title"),
                    "link": text(item, "link"),
                    "published_raw": text(item, "pubDate", "dc:date"),
                    "summary": text(item, "description"),
                    "feed_title": feed_title,
                }
            )
    elif root.tag == f"{atom}feed":
        feed_title = text(root, f"{atom}title")
        for item in root.findall(f"{atom}entry"):
            link_el = item.find(f"{atom}link")
            href = link_el.get("href", "") if link_el is not None else ""
            entries.append(
                {
                    "entry_title": text(item, f"{atom}title"),
                    "link": href,
                    "published_raw": text(item, f"{atom}published", f"{atom}updated"),
                    "summary": text(item, f"{atom}summary", f"{atom}content"),
                    "feed_title": feed_title,
                }
            )
    return entries


def default_fetcher(url: str) -> str:
    """Production fetcher (urllib). Network-touching; never used in tests."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=30) as resp:  # noqa: S310
        return resp.read().decode("utf-8", errors="replace")


def file_fetcher(url: str) -> str:
    """Offline fetcher: ``file://`` URLs (or plain paths) read from local
    disk — the landing-dir pattern for air-gapped runs and the CLI's
    default when a config's feed URLs point at pre-fetched XML."""
    path = url[len("file://"):] if url.startswith("file://") else url
    with open(path, encoding="utf-8") as fh:
        return fh.read()


RAW_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("job_title", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("entry_title", T.StringType()),
        T.StructField("published_raw", T.StringType()),
        T.StructField("feed_title", T.StringType()),
        T.StructField("reader", T.StringType()),
        T.StructField("time_window", T.StringType()),
        T.StructField("summary_html", T.StringType()),
    ]
)


def fetch_feeds(
    spark,
    feeders: list[Feeder],
    fetcher: Fetcher | None = None,
) -> DataFrame:
    """Distributed fetch+parse: one task per config partition (S1).

    Emits RAW entries (unparsed timestamp string, uncleaned HTML summary);
    ``clean_entries`` below applies the relational cleanup so everything
    after the fetch boundary is ordinary Catalyst expressions.
    """
    import pandas as pd

    from ..session import ensure_executors_can_import

    ensure_executors_can_import(spark)
    fetch = fetcher or default_fetcher
    config_rows = [
        (f.effective_job_title, f.url, f.title, f.reader, f.time) for f in feeders
    ]
    config_df = spark.createDataFrame(
        config_rows, "job_title string, url string, title string, reader string, time string"
    ).repartition(max(1, min(len(config_rows), 32)))

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    raw = fetch(row.url)
                except Exception:  # noqa: BLE001 — unreachable feed: emit nothing
                    continue
                for e in parse_feed_xml(raw):
                    out.append(
                        {
                            "job_title": row.job_title,
                            "link": e["link"],
                            "entry_title": e["entry_title"],
                            "published_raw": e["published_raw"],
                            "feed_title": e["feed_title"] or row.title,
                            "reader": row.reader,
                            "time_window": row.time,
                            "summary_html": e["summary"],
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in RAW_ENTRY_SCHEMA.fields]
            )

    return config_df.mapInPandas(fetch_partition, RAW_ENTRY_SCHEMA)


def clean_entries(
    raw: DataFrame,
    tz: str | None = None,
    now: str | None = None,
) -> DataFrame:
    """Raw entries → stage schema: HTML→text summary (X1), whitespace
    collapse (F4), lenient timestamp parse (F7), optional UTC→tz convert
    (F8), missing published defaults to ``now`` (core/etl.py:137-139).
    """
    from ..functions.text import collapse_whitespace, html_to_text_udf
    from ..functions.timestamps import lenient_to_timestamp, utc_to_tz

    clean = html_to_text_udf()
    ts = lenient_to_timestamp(F.col("published_raw"))
    if tz:
        ts = utc_to_tz(ts, tz)
    now_ts = F.to_timestamp(F.lit(now)) if now else F.current_timestamp()
    return raw.select(
        collapse_whitespace(F.col("job_title")).alias("job_title"),
        F.trim(F.col("link")).alias("link"),
        collapse_whitespace(F.col("entry_title")).alias("entry_title"),
        F.coalesce(ts, now_ts).alias("published"),
        F.trim(F.col("feed_title")).alias("feed_title"),
        F.trim(F.col("reader")).alias("reader"),
        F.trim(F.col("time_window")).alias("time_window"),
        clean(F.col("summary_html")).alias("summary"),
        F.lit("").alias("notes"),
    )
