"""Custom Python DataSource (Spark 4 DataSource V2 Python API): the
REST coin feed as a first-class ``spark.read.format(...)`` source.

``sources/rest.py::ingest_rest`` covers the one-page driver-side
fetch; this source is the *distributed* form: page fetches become
input partitions, so a many-page crawl runs one page per task across
the cluster (the shape data-extract.py:12-20 of the reference would
need at real scale). The fetch itself is pluggable and defaults to a
deterministic synthetic generator (the test container has no network;
a real deployment points ``fetch_module`` at an HTTP-backed page
function).

Usage:
    spark.dataSource.register(CoinMarketsDataSource)
    df = (spark.read.format("coin_markets")
          .option("pages", 4).option("per_page", 250).load())

Each page is one ``InputPartition`` → Spark schedules fetches in
parallel and the result is a normal DataFrame (schema below), ready
for pipeline.coins.normalize/split.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA_DDL = (
    "id string, symbol string, name string, image string, "
    "current_price double, market_cap bigint, market_cap_rank int, "
    "total_volume bigint, high_24h double, low_24h double, "
    "price_change_24h double, price_change_percentage_24h double, "
    "circulating_supply double, total_supply double, max_supply double, "
    "last_updated string, page int"
)


def synthetic_page(page: int, per_page: int) -> list[tuple]:
    """Deterministic stand-in for the CoinGecko page fetch — same seed
    discipline as pipeline/fixtures.py."""
    import random

    rng = random.Random(1000 + page)
    rows = []
    for i in range(per_page):
        idx = page * per_page + i
        price = round(rng.uniform(0.01, 70000.0), 6)
        supply = round(rng.uniform(1e6, 1e9), 2)
        cap = int(price * supply)
        rows.append(
            (
                f"coin-{idx:05d}",
                f"c{idx:05d}",
                f"Coin {idx:05d}",
                f"https://img.example/c{idx:05d}.png",
                price,
                cap,
                idx + 1,
                int(cap * rng.uniform(0.01, 0.2)),
                round(price * rng.uniform(1.0, 1.2), 6),
                round(price * rng.uniform(0.8, 1.0), 6),
                round(price * rng.uniform(-0.1, 0.1), 6),
                round(rng.uniform(-10, 10), 5),
                supply,
                round(supply * 1.2, 2),
                None if rng.random() < 0.2 else round(supply * 1.5, 2),
                "2024-01-01T00:00:00.000Z",
                page,
            )
        )
    return rows


class RateLimitedError(RuntimeError):
    """Transient page-fetch rejection (the HTTP 429 of a live feed)."""


def fetch_with_retry(
    fetch,
    *,
    max_retries: int = 3,
    backoff_s: float = 1.0,
    sleep=None,
):
    """Bounded exponential backoff around one page fetch.

    Rate limiting is the failure mode a paged crawl actually hits
    (data-extract.py:35-46 swallows it and ships nothing; the DAG's
    sensor then times out an hour later). Here the policy is explicit:
    retry ``max_retries`` times with doubling delay, then RAISE — the
    task fails loudly and Spark's own task retry / the job failure
    surfaces it, never a silently-short dataset. Retrying inside the
    task (not via task re-run alone) matters at scale: a task retry
    re-fetches with zero delay and re-hits the limiter, while backoff
    inside the task is the polite client the API expects."""
    import time

    do_sleep = sleep if sleep is not None else time.sleep
    delay = backoff_s
    attempt = 0
    while True:
        try:
            return fetch()
        except RateLimitedError:
            if attempt >= max_retries:
                raise
            do_sleep(delay)
            delay *= 2
            attempt += 1


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class CoinMarketsReader(DataSourceReader):
    """Options: ``pages``, ``per_page``, plus the retry policy
    (``max_retries``, ``backoff_s``) and a deterministic fault
    injector for tests — ``fail_pages`` (csv of page numbers) raise
    RateLimitedError on their first ``fail_times`` fetch attempts,
    exercising the same code path a live 429 takes."""

    def __init__(self, options):
        self.pages = int(options.get("pages", 1))
        self.per_page = int(options.get("per_page", 250))
        self.max_retries = int(options.get("max_retries", 3))
        self.backoff_s = float(options.get("backoff_s", 1.0))
        fp = str(options.get("fail_pages", "") or "")
        self.fail_pages = {int(p) for p in fp.split(",") if p.strip()}
        self.fail_times = int(options.get("fail_times", 0))

    def partitions(self):
        # one REST page per input partition = one fetch per task
        return [_PagePartition(p) for p in range(self.pages)]

    def read(self, partition: _PagePartition):
        attempts = {"n": 0}

        def fetch():
            if (
                partition.page in self.fail_pages
                and attempts["n"] < self.fail_times
            ):
                attempts["n"] += 1
                raise RateLimitedError(
                    f"429 Too Many Requests (page {partition.page}, "
                    f"attempt {attempts['n']})"
                )
            return synthetic_page(partition.page, self.per_page)

        # backoff_s=0 in tests: the retry LOGIC is what's under test,
        # not wall-clock waiting
        yield from fetch_with_retry(
            fetch, max_retries=self.max_retries, backoff_s=self.backoff_s
        )


class CoinMarketsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "coin_markets"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> CoinMarketsReader:
        return CoinMarketsReader(self.options)

    def streamReader(self, schema) -> "CoinMarketsStreamReader":
        return CoinMarketsStreamReader(self.options)


class CoinMarketsStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the paged feed: offsets are page
    numbers, each micro-batch ingests the pages published since the
    last committed offset, one page per input partition (one fetch per
    task — the same distribution story as the batch reader).

    Exactly-once comes from Spark's offset log: a failed batch replays
    the SAME [start, end) page window (the fetch is idempotent), and a
    restart resumes from the committed offset. ``latestOffset`` MUST
    be a monotonic high-water mark derived from the feed itself — a
    reader-local counter would reset on restart and report an offset
    behind the checkpoint, corrupting the offset sequence. Here the
    high-water mark is ``max_pages`` (the whole synthetic feed is
    "published"); a live deployment returns the feed's current page
    count, and per-batch admission control (Kafka's
    maxOffsetsPerTrigger analog) belongs in that function — e.g.
    ``min(feed_hwm, committed + K)`` with ``committed`` tracked via
    ``commit()``, never below it.
    """

    def __init__(self, options):
        self.per_page = int(options.get("per_page", 250))
        self.max_pages = int(options.get("max_pages", 8))

    def initialOffset(self):
        return {"page": 0}

    def latestOffset(self):
        return {"page": self.max_pages}

    def partitions(self, start, end):
        return [_PagePartition(p) for p in range(start["page"], end["page"])]

    def read(self, partition: _PagePartition):
        yield from synthetic_page(partition.page, self.per_page)

    def commit(self, end):
        # source-side cleanup hook: nothing to prune for an idempotent
        # REST page fetch
        pass


class CoinMarketsSimpleDataSource(DataSource):
    """`coin_markets_simple`: the same feed through Spark 4's
    SIMPLE streaming source API (``SimpleDataSourceStreamReader``).

    Contrast with ``CoinMarketsStreamReader`` above — the two APIs
    trade planning for simplicity:

    - simple reader: ``read(start)`` runs ON THE DRIVER, returns the
      batch's rows AND the next offset in one call; no partition
      planning, so per-batch throughput is bounded by one process.
      Right for low-volume control-plane feeds (a ~250-row coin page
      — the reference's actual scale, data-extract.py:12-20).
    - full reader: offsets → ``partitions()`` → distributed
      ``read(partition)`` per task. Right when a batch spans many
      pages and fetches should fan out across executors.

    Replay contract: data returned by ``read`` is cached driver-side
    by Spark until committed; ``readBetweenOffsets`` re-serves an
    uncommitted [start, end) window after a restart, which is pure
    recomputation here because the synthetic fetch is idempotent.
    """

    @classmethod
    def name(cls) -> str:
        return "coin_markets_simple"

    def schema(self) -> str:
        return SCHEMA_DDL

    def simpleStreamReader(self, schema) -> "CoinMarketsSimpleStreamReader":
        return CoinMarketsSimpleStreamReader(self.options)


class CoinMarketsSimpleStreamReader(SimpleDataSourceStreamReader):
    """One feed page per micro-batch; offset = next unread page."""

    def __init__(self, options):
        self.per_page = int(options.get("per_page", 250))
        self.max_pages = int(options.get("max_pages", 8))

    def initialOffset(self):
        return {"page": 0}

    def read(self, start):
        p = start["page"]
        if p >= self.max_pages:  # feed exhausted: empty batch, same offset
            return iter([]), start
        return iter(synthetic_page(p, self.per_page)), {"page": p + 1}

    def readBetweenOffsets(self, start, end):
        for p in range(start["page"], end["page"]):
            yield from synthetic_page(p, self.per_page)

    def commit(self, end):
        pass
