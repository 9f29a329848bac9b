"""Python DataSource V2 for the HH-style paginated REST source
(SURVEY §4.3 phase 2: `pyspark.sql.datasource`, Spark 4).

`spark.read.format("hh_replay").option("fixture", path).load()` scans
recorded page payloads with one *input partition per page* — on a
cluster, pages fan out across executors (the reference's asyncio
fan-out, hh_api.py:144-151, re-expressed as Spark task parallelism).
The live-HTTP variant plugs a transport into the same reader; rate
limiting happens per-partition (A3) so the aggregate request rate is
bounded by partitions × limiter rate.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("published_at", T.StringType()),
        T.StructField("salary_from", T.LongType()),
        T.StructField("salary_to", T.LongType()),
        T.StructField("salary_currency", T.StringType()),
        T.StructField("employer_name", T.StringType()),
        T.StructField("area_name", T.StringType()),
        T.StructField("page", T.IntegerType()),
    ]
)


class HHPagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class HHReplayReader(DataSourceReader):
    def __init__(self, options: dict):
        self.fixture_path = options.get("fixture")
        if not self.fixture_path:
            raise ValueError("option 'fixture' (path to recorded pages JSON) is required")
        with open(self.fixture_path) as f:
            self.n_pages = int(json.load(f)[0].get("pages", 1))

    def partitions(self):
        # one partition per API page -> pages scan in parallel on a cluster
        return [HHPagePartition(p) for p in range(self.n_pages)]

    def read(self, partition: HHPagePartition):
        with open(self.fixture_path) as f:
            page = json.load(f)[partition.page]
        for item in page.get("items", []):
            salary = item.get("salary") or {}
            yield (
                item.get("id"),
                item.get("name"),
                item.get("published_at"),
                salary.get("from"),
                salary.get("to"),
                salary.get("currency"),
                (item.get("employer") or {}).get("name"),
                (item.get("area") or {}).get("name"),
                partition.page,
            )


class HHReplayDataSource(DataSource):
    """Register once per session:
    ``spark.dataSource.register(HHReplayDataSource)`` then
    ``spark.read.format("hh_replay").option("fixture", p).load()``."""

    @classmethod
    def name(cls) -> str:
        return "hh_replay"

    def schema(self):
        return ITEM_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return HHReplayReader(self.options)

    def simpleStreamReader(self, schema) -> "HHReplayStreamReader":
        return HHReplayStreamReader(self.options)


class HHReplayStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming reader over the same recorded pages: each
    micro-batch ingests ONE API page (offset = page index), modelling
    the reference's incremental daily pulls as a Structured Streaming
    source with exactly-once, replayable offsets. `readBetweenOffsets`
    re-serves a committed range verbatim, so recovery after a crash
    re-ingests identical rows (the checkpoint holds only {page: N})."""

    def __init__(self, options: dict):
        self.fixture_path = options.get("fixture")
        if not self.fixture_path:
            raise ValueError("option 'fixture' (path to recorded pages JSON) is required")
        with open(self.fixture_path) as f:
            self.n_pages = int(json.load(f)[0].get("pages", 1))

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _rows(self, page_no: int):
        with open(self.fixture_path) as f:
            pages = json.load(f)
        if page_no >= len(pages):
            return
        for item in pages[page_no].get("items", []):
            salary = item.get("salary") or {}
            yield (
                item.get("id"),
                item.get("name"),
                item.get("published_at"),
                salary.get("from"),
                salary.get("to"),
                salary.get("currency"),
                (item.get("employer") or {}).get("name"),
                (item.get("area") or {}).get("name"),
                page_no,
            )

    def read(self, start: dict):
        page_no = int(start["page"])
        if page_no >= self.n_pages:
            return iter([]), start
        # a picklable iterator (list_iterator), not a generator: the
        # simple stream reader prefetches on the driver and ships the
        # iterator to executors via pickle
        return iter(list(self._rows(page_no))), {"page": page_no + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                row
                for p in range(int(start["page"]), int(end["page"]))
                for row in self._rows(p)
            ]
        )
