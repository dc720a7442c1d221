"""spark.read.format("whois") — the custom Python DataSource end to
end against a local server, composed with the contact parser."""

from __future__ import annotations

import http.server
import json
import threading

import pytest


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        domain = self.path.rsplit("/", 1)[-1]
        if domain == "dead.example":
            self.send_error(500)
            return
        body = json.dumps(
            {"whois_record": {"registrant_contact": {"full_name": f"Owner of {domain}"}}}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/whois/"
    srv.shutdown()


def test_whois_format_reads_and_parses(spark, server):
    from htmlentityextraction_spark.sources.http import whois_contacts
    from htmlentityextraction_spark.sources.whois_source import WhoIsDataSource

    spark.dataSource.register(WhoIsDataSource)
    df = (
        spark.read.format("whois")
        .option("endpoint", server)
        .option("domains", "a.example,b.example,dead.example,c.example")
        .option("numPartitions", 2)
        .load()
    )
    assert df.rdd.getNumPartitions() == 2, "domain chunks must fetch in parallel"
    rows = {r.domain: r for r in df.collect()}
    assert len(rows) == 4
    assert rows["a.example"].status == 200
    assert rows["dead.example"].status == -1, "a dead domain yields an error row"
    # compose with the contact parser: full S13 path from format() in
    parsed = {
        r.domain: r
        for r in whois_contacts(df.filter(df.status == 200), "domain", "raw").collect()
    }
    assert parsed["b.example"].registrant_full_name == "Owner of b.example"
    assert parsed["c.example"].technical_phone_number == "N/A"
