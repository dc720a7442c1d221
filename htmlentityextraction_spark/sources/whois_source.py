"""Custom Python Data Source (Spark 4 DataSource API): the WhoIs REST
ingest (S13) as a real ``spark.read.format("whois")`` source.

The reference fetched WhoIs records in a driver-side loop
(`emr/WhoIsExtractor.scala:25-68`). Here the fetch IS the source:
domains are split across input partitions, each task fetches its
chunk from the configured endpoint (stdlib urllib), and failures
become status=-1 rows instead of task failures. This is the
swap-one-line claim made concrete for the plugin path — the same
DataSource API a production deployment would use to wrap any REST or
proprietary store, with partition-parallel ingest for free.

Options:
- ``endpoint``: base URL; the domain is appended (e.g.
  ``http://host:port/whois/``).
- ``domains``: comma-separated domain list.
- ``numPartitions``: fetch parallelism (default 2).

Exercised against a local http.server in
tests/test_whois_datasource.py; compose with
``sources.http.whois_contacts`` for the parsed contact layout.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class WhoIsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "whois"

    def schema(self) -> str:
        return "domain string, status int, raw string"

    def reader(self, schema) -> "WhoIsReader":
        return WhoIsReader(self.options)


class WhoIsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.endpoint = options.get("endpoint")
        if not self.endpoint:
            raise ValueError("whois source requires an 'endpoint' option")
        domains = options.get("domains", "")
        self.domains = [d.strip() for d in domains.split(",") if d.strip()]
        self.num_partitions = max(int(options.get("numpartitions", 2)), 1)
        self.timeout = float(options.get("timeout", 10.0))

    def partitions(self):
        n = min(self.num_partitions, max(len(self.domains), 1))
        chunks = [self.domains[i::n] for i in range(n)]
        return [InputPartition(c) for c in chunks]

    def read(self, partition):
        import urllib.request

        for domain in partition.value:
            try:
                with urllib.request.urlopen(self.endpoint + domain, timeout=self.timeout) as r:
                    yield (domain, int(r.status), r.read().decode("utf-8", "replace"))
            except Exception as exc:  # noqa: BLE001 — dead domain must not kill the scan
                yield (domain, -1, f"{type(exc).__name__}: {exc}")
