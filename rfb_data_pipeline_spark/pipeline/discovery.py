"""Monthly-drop discovery (reference A1, src/main.py:49-77).

The reference GETs the RFB listing page and scrapes ``<a href>``
anchors ending in ``.zip`` with BeautifulSoup. Here the HTML parsing
is stdlib (html.parser) and the transport is injected — a callable
``fetch(url) -> str`` — so tests run offline (file:// or literal HTML)
and production plugs in any HTTP client. Discovery is driver-side by
design: it's a ~40-row listing, not a distributed dataset
(SURVEY.md §2.1 A1).
"""

from __future__ import annotations

import urllib.request
from collections.abc import Callable
from html.parser import HTMLParser
from urllib.parse import urljoin


def default_fetch(url: str, timeout: int = 60) -> str:
    """urllib-based fetch (supports http(s):// and file://)."""
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        data = resp.read()
    return data.decode("utf-8", errors="replace")


class _AnchorParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag.lower() == "a":
            for name, value in attrs:
                if name.lower() == "href" and value:
                    self.hrefs.append(value)


def parse_zip_links(html: str) -> list[str]:
    parser = _AnchorParser()
    parser.feed(html)
    return [h for h in parser.hrefs if h.lower().endswith(".zip")]


def listing_url(ano: str, mes: str) -> str:
    """The RFB open-data layout: one directory per month
    (reference src/main.py:56)."""
    return (
        "https://arquivos.receitafederal.gov.br/dados/cnpj/"
        f"dados_abertos_cnpj/{ano}-{mes}/"
    )


def discover_files(
    base_url: str, fetch: Callable[[str], str] = default_fetch
) -> list[tuple[str, str]]:
    """(arquivo, absolute_url) pairs for every zip in the listing —
    the manifest's planning input (manifest.new_manifest)."""
    html = fetch(base_url)
    out = []
    seen: set[str] = set()
    for href in parse_zip_links(html):
        name = href.rstrip("/").split("/")[-1]
        # dedupe: Apache-autoindex listings carry two anchors per file
        # (icon + name); duplicate rows would race two downloads onto
        # one dest path and fan out every manifest join (r09 review)
        if name in seen:
            continue
        seen.add(name)
        out.append((name, urljoin(base_url, href)))
    return out
