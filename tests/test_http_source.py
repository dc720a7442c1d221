"""S12/S13 HTTP transport against a local stdlib server — the real
fetch code paths, no external network."""

from __future__ import annotations

import http.server
import threading

import pytest

from htmlentityextraction_spark.sources import http as hs

_PAGES = {
    "/p/1": "<html><body>cost $12.99 today</body></html>",
    "/p/2": "<html><body>Price: 7.50</body></html>",
    "/whois/shop.example": '{"whois_record": {"registrant_contact": {"full_name": "Jo Shop"}}}',
}


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 — stdlib API name
        body = _PAGES.get(self.path)
        if body is None:
            self.send_error(404)
            return
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_url_text_single(server):
    assert hs.fetch_url_text(f"{server}/p/1") == _PAGES["/p/1"]


def test_fetch_pages_distributed_with_failures(server):
    from htmlentityextraction_spark.session import get_spark

    spark = get_spark("pytest")
    urls = spark.createDataFrame(
        [(f"{server}/p/1",), (f"{server}/p/2",), (f"{server}/missing",)], "url string"
    )
    rows = {r.url: r for r in hs.fetch_pages(urls).collect()}
    assert rows[f"{server}/p/1"].status == 200
    assert rows[f"{server}/p/1"].body == _PAGES["/p/1"]
    assert rows[f"{server}/p/2"].body == _PAGES["/p/2"]
    # a dead URL yields an error row, not a task failure
    assert rows[f"{server}/missing"].status == -1
    assert "404" in rows[f"{server}/missing"].body


def test_whois_fetch_then_extract(server, spark):
    raw = hs.fetch_url_text(f"{server}/whois/shop.example")
    df = spark.createDataFrame([("shop.example", raw)], "domain string, raw string")
    out = hs.whois_contacts(df).first()
    assert out.registrant_full_name == "Jo Shop"
    assert out.registrant_company_name == "N/A"
    assert out.technical_phone_number == "N/A"
    parts = out.contact_line.split(hs.RAW_DELIMITER)
    assert parts[0] == "shop.example" and parts[1] == "Jo Shop" and len(parts) == 28
