"""Offline HTTP integration (S2) against a loopback http.server —
the scale analogue of the reference's WEBrick doubles
(``spec/rika/parser_spec.rb:24-46``) and its redirect/404/500/unknown-host
expectations (``spec/integration/web_url_processing_spec.rb:150-190``).
No outbound network is used: the server binds 127.0.0.1."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from rika_ray.sources.ingest import fetch_to_table

_POEM = "Stopping by Woods on a Snowy Evening"
_HTML_PAGE = (
    "<html><head><title>Fixture</title></head><body>"
    "<nav>home | about | contact</nav>"
    f"<article><p>{_POEM}. The woods are lovely, dark and deep, "
    "but I have promises to keep, and miles to go before I sleep, "
    "and miles to go before I sleep.</p></article>"
    "<footer>copyright fixture</footer></body></html>"
)


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (stdlib signature)
        if self.path == "/document.txt":
            body = (_POEM + "\nWhose woods these are I think I know.\n").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/page.html":
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(_HTML_PAGE.encode())
        elif self.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/document.txt")
            self.end_headers()
        elif self.path == "/redirect-chain":
            self.send_response(301)
            self.send_header("Location", "/redirect")
            self.end_headers()
        elif self.path == "/boom":
            self.send_error(500, "Server Error")
        else:
            self.send_error(404, "Not Found")

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def server_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    t.join(timeout=5)


def _row(table: pa.Table, url: str) -> dict:
    rows = table.to_pylist()
    return next(r for r in rows if r["url"] == url)


def test_fetch_success_and_content(server_url):
    t = fetch_to_table([server_url + "/document.txt"])
    r = _row(t, server_url + "/document.txt")
    assert r["error_type"] is None
    assert _POEM.encode() in r["html"]


def test_fetch_follows_redirects(server_url):
    """Single-hop and chained redirects land on the target body
    (web_url_processing_spec.rb: 'follows HTTP redirects correctly')."""
    for path in ("/redirect", "/redirect-chain"):
        t = fetch_to_table([server_url + path])
        r = _row(t, server_url + path)
        assert r["error_type"] is None, path
        assert _POEM.encode() in r["html"], path


def test_fetch_http_error_mapping(server_url):
    """404 and 500 map to io_error rows whose message carries the URL and
    status (the reference raises IOException matching /500|Server Error/
    and includes the URL for 404)."""
    url404 = server_url + "/missing.txt"
    url500 = server_url + "/boom"
    t = fetch_to_table([url404, url500])
    r404, r500 = _row(t, url404), _row(t, url500)
    assert r404["error_type"] == "io_error" and r404["html"] is None
    assert url404 in r404["error_message"] and "404" in r404["error_message"]
    assert r500["error_type"] == "io_error" and r500["html"] is None
    assert "500" in r500["error_message"]


def test_fetch_unknown_host_and_bad_targets():
    """Unresolvable host → unknown_host (UnknownHostException analogue);
    non-http scheme → bad_url_scheme; hostless URL → invalid_url."""
    bad_host = "http://non-existent-server-12345.invalid/document.pdf"
    t = fetch_to_table([bad_host, "ftp://example.com/x.pdf", "http://"])
    assert _row(t, bad_host)["error_type"] in ("unknown_host", "io_error")
    assert _row(t, "ftp://example.com/x.pdf")["error_type"] == "bad_url_scheme"
    assert _row(t, "http://")["error_type"] == "invalid_url"


def test_fetched_pages_extract_end_to_end(server_url, ray_session):
    """Mixed success/failure fetch → extraction pipeline: good rows get
    real extracted content (HTML main content, text passthrough), error
    rows never reach the parser (mirrors the reference's mixed-input
    session test)."""
    import ray.data

    from rika_ray.pipelines.extraction import (
        ExtractionConfig,
        build_extraction_pipeline,
    )

    urls = [
        server_url + "/document.txt",
        server_url + "/page.html",
        server_url + "/redirect",
        server_url + "/missing.txt",
    ]
    fetched = fetch_to_table(urls)
    assert [r["error_type"] for r in fetched.to_pylist()].count(None) == 3
    good = fetched.filter(pc.is_null(fetched["error_type"])).drop_columns(
        ["error_type", "error_message"]
    )
    out = build_extraction_pipeline(
        ray.data.from_arrow(good), ExtractionConfig()
    )
    by_url = {r["url"]: r for r in out.take_all()}
    assert _POEM in by_url[server_url + "/document.txt"]["content"]
    assert by_url[server_url + "/document.txt"]["media_type"] == "text/plain"
    html_row = by_url[server_url + "/page.html"]
    assert html_row["media_type"] == "text/html"
    assert "promises to keep" in html_row["content"]
    assert "home | about" not in html_row["content"]  # boilerplate stripped
    assert _POEM in by_url[server_url + "/redirect"]["content"]
