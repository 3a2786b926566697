"""Feed-spider node iteration (SURVEY.md §2.6 P7).

The reference's ``scrapy/spiders/feed.py::XMLFeedSpider`` walks an XML feed's
``itertag`` nodes and hands each to ``parse_node``; ``CSVFeedSpider`` hands
each csv row to ``parse_row``.  These are the per-record iterators those
spiders drive, stdlib-only (xml.etree + csv), exposed as pure functions so a
Ray pipeline can ``map_batches``/flat_map feed payloads into node rows.
"""

from __future__ import annotations

import csv
import io
import xml.etree.ElementTree as ET


def iter_xml_nodes(xml: str, itertag: str) -> list[dict[str, str]]:
    """All ``itertag`` element nodes of the feed, each as a dict of child
    tag -> text (attributes are merged in with an ``@`` prefix, matching the
    common RSS/Atom access patterns; missing text -> "")."""
    root = ET.fromstring(xml)
    out: list[dict[str, str]] = []
    # root.iter(itertag) yields the root itself when it matches AND any
    # nested itertag descendants — special-casing root.tag == itertag to
    # [root] silently dropped nodes one nesting level deeper (advice r2)
    for node in root.iter(itertag):
        row: dict[str, str] = {}
        for k, v in node.attrib.items():
            row[f"@{k}"] = v
        for child in node:
            row[child.tag] = child.text or ""
        out.append(row)
    return out


def iter_csv_rows(
    payload: str,
    delimiter: str = ",",
    quotechar: str = '"',
    headers: list[str] | None = None,
) -> list[dict[str, str]]:
    """CSV rows as dicts.  ``headers=None`` reads them from the first line
    (CSVFeedSpider's default); explicit headers treat every line as data."""
    reader = csv.reader(
        io.StringIO(payload), delimiter=delimiter, quotechar=quotechar
    )
    rows = list(reader)
    if not rows:
        return []
    if headers is None:
        headers, rows = rows[0], rows[1:]
    return [dict(zip(headers, r)) for r in rows if r]
