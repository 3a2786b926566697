"""Vector tests for the P7 feed-node iterators (functions/feedparse.py)."""

from __future__ import annotations

from scrapy__ray.functions.feedparse import iter_csv_rows, iter_xml_nodes


def test_xml_basic_items():
    xml = """<?xml version="1.0"?><rss><channel>
      <item><id>1</id><name>a</name></item>
      <item><id>2</id><name>b&amp;c</name></item>
    </channel></rss>"""
    rows = iter_xml_nodes(xml, "item")
    assert rows == [{"id": "1", "name": "a"}, {"id": "2", "name": "b&c"}]


def test_xml_nested_itertag_and_attrs():
    xml = "<feed><entry rank='3'><t>x</t><entry><t>inner</t></entry></entry></feed>"
    rows = iter_xml_nodes(xml, "entry")
    # document-order iteration finds nested entries too (ElementTree.iter)
    assert rows[0]["@rank"] == "3"
    assert rows[0]["t"] == "x"
    assert rows[1] == {"t": "inner"}


def test_xml_empty_text_and_missing_children():
    rows = iter_xml_nodes("<r><item><a/></item><item/></r>", "item")
    assert rows == [{"a": ""}, {}]


def test_xml_root_is_itertag():
    assert iter_xml_nodes("<item><a>1</a></item>", "item") == [{"a": "1"}]


def test_csv_header_row():
    rows = iter_csv_rows("a,b\n1,2\n3,4\n")
    assert rows == [{"a": "1", "b": "2"}, {"a": "3", "b": "4"}]


def test_csv_explicit_headers_and_delimiter():
    rows = iter_csv_rows("1;2\n3;4\n", delimiter=";", headers=["x", "y"])
    assert rows == [{"x": "1", "y": "2"}, {"x": "3", "y": "4"}]


def test_csv_quoting_and_embedded_delims():
    rows = iter_csv_rows('a,b\n"1,5","he said ""hi"""\n')
    assert rows == [{"a": "1,5", "b": 'he said "hi"'}]


def test_csv_blank_lines_skipped():
    assert iter_csv_rows("a,b\n\n1,2\n\n") == [{"a": "1", "b": "2"}]


def test_csv_empty_payload():
    assert iter_csv_rows("") == []


def test_xml_root_itertag_with_nested_descendants():
    # root matching itertag must not hide nested itertag descendants
    # (advice r2: the [root] special case dropped them)
    xml = "<item><a>top</a><item><a>nested</a></item></item>"
    # identical to wrapping the same structure in an outer element:
    wrapped = iter_xml_nodes("<r>" + xml + "</r>", "item")
    assert iter_xml_nodes(xml, "item") == wrapped
    assert wrapped == [{"a": "top", "item": ""}, {"a": "nested"}]
