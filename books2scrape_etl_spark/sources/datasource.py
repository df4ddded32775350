"""`books` Python DataSource — the scraper as a FIRST-CLASS Spark source.

Spark 4's Python Data Source API lets the whole extract stage
(extract_pipeline.py:57-90: page -> listing -> detail -> parsed book)
appear to the engine as ``spark.read.format("books").option("pages",
N).load()``: Catalyst sees a real scan node with a declared schema,
one InputPartition per listing page (so a 50-page site reads
50-way parallel — the reference loops serially), and column pruning /
downstream pushdown compose like any other source.

Options:
- ``pages`` (int, default 1): listing pages to read (partition count).
- ``fixtures`` ("true"/"false", default "true"): offline HTML fixtures
  (tests/CI) vs live HTTP. Live mode keeps one requests.Session per
  partition and honors ``throttle_s`` between GETs (politeness — the
  site is the bottleneck, SURVEY.md §7.4.5).

The parse kernels are shared with the mapInPandas pipeline
(sources/scrape.py) — one parser, two surfaces.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from books2scrape_etl_spark.sources.fixtures_html import DETAIL_PAGES, LISTING_PAGES
from books2scrape_etl_spark.sources.scrape import (
    BOOK_STRUCT,
    _extract_links,
    _parse_book,
)

_FIELDS = [f.name for f in BOOK_STRUCT.fields]


def register_books_source(spark) -> None:
    """Register the ``books`` format, shipping the implementation BY
    VALUE: the streaming source's planner runs in a separate driver-side
    Python worker that has neither the repo cwd nor the executors'
    addPyFile zip on sys.path, so a by-reference pickle of these classes
    dies on import there. ``cloudpickle.register_pickle_by_value`` makes
    the pickle self-contained (classes + the parse kernels + fixture
    pages travel inside it); pyspark/pandas stay by-reference since
    every worker can import those."""
    from pyspark import cloudpickle  # the vendored pickler Spark serializes with

    from books2scrape_etl_spark.sources import datasource, fixtures_html, scrape

    for m in (datasource, scrape, fixtures_html):
        cloudpickle.register_pickle_by_value(m)
    spark.dataSource.register(BooksDataSource)


class BooksDataSource(DataSource):
    """``spark.dataSource.register(BooksDataSource)`` then
    ``spark.read.format("books")``."""

    @classmethod
    def name(cls) -> str:
        return "books"

    def schema(self):
        return BOOK_STRUCT

    def reader(self, schema) -> DataSourceReader:
        return _BooksReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _BooksStreamReader(self.options)


class _BooksReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_pages = int(options.get("pages", "1"))
        self.fixtures = str(options.get("fixtures", "true")).lower() == "true"
        self.throttle_s = float(options.get("throttle_s", "0.5"))

    def partitions(self) -> list[InputPartition]:
        # one partition per listing page: the fan-out unit of the site,
        # so parallelism == pages without any repartition
        return [InputPartition(p) for p in range(1, self.n_pages + 1)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        page_no = partition.value
        for html in self._detail_htmls(page_no):
            book = _parse_book(html)
            if book is not None:
                yield tuple(book[f] for f in _FIELDS)

    def _detail_htmls(self, page_no: int) -> Iterator[str]:
        if self.fixtures:
            if page_no > len(LISTING_PAGES):
                return
            details = dict(DETAIL_PAGES)
            _, listing_html = LISTING_PAGES[page_no - 1]
            for url in _extract_links(listing_html):
                if url in details:
                    yield details[url]
            return
        # live path (never in tests/CI): session per partition, throttled
        import time

        import requests

        session = requests.Session()
        listing_url = f"http://books.toscrape.com/catalogue/page-{page_no}.html"
        try:
            listing_html = session.get(listing_url, timeout=30).text
        except Exception:
            return
        for url in _extract_links(listing_html):
            if self.throttle_s:
                time.sleep(self.throttle_s)
            try:
                yield session.get(url, timeout=30).text
            except Exception:
                continue


class _BooksStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: ONE listing page per micro-batch — the
    incremental analogue of the reference's rescrape-everything cron
    (airflow.py:31): each trigger advances the page offset, already-read
    pages are never refetched, and checkpoint replay re-reads a page
    deterministically via readBetweenOffsets. Offsets are plain dicts
    {"page": n} — the committed page count."""

    def __init__(self, options) -> None:
        self._reader = _BooksReader(options)

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _page_rows(self, page_no: int) -> list[tuple]:
        return list(self._reader.read(InputPartition(page_no)))

    def read(self, start: dict):
        page = start["page"] + 1
        if page > self._reader.n_pages:
            return iter(()), start  # caught up: offset unchanged
        return iter(self._page_rows(page)), {"page": page}

    def readBetweenOffsets(self, start: dict, end: dict):
        for page in range(start["page"] + 1, end["page"] + 1):
            yield from self._page_rows(page)
