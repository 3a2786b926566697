"""Spill-base property tests (SURVEY.md 10^10-frontier path): resolve()
must read O(scheduled) rows from a spilled pending set, never O(pending).
Drives a FrontierShard in-process (plain class, ray only for ray.put)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest
import ray

import scrapy__ray.state.frontier_shard as fs
from scrapy__ray.config import CrawlConfig
from scrapy__ray.schema import FRONTIER_SCHEMA


def _frontier_table(host: str, n: int, start: int = 0) -> pa.Table:
    rows = []
    for i in range(start, start + n):
        url = f"http://{host}/p/{i}"
        fp = hashlib.sha1(url.encode()).digest()
        rows.append(
            (url, host, 1, fp, 0, 1, 0, "http://parent", i, 0, 0, False, 0, "")
        )
    cols = list(zip(*rows))
    return pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, FRONTIER_SCHEMA)],
        schema=FRONTIER_SCHEMA,
    )


def _scheduled_urls(shard, rnd):
    refs = shard.resolve(rnd, 10_000)
    return [u for r in refs for u in ray.get(r)["url"].to_pylist()]


def test_resolve_reads_o_scheduled_not_o_pending(ray_session, monkeypatch):
    monkeypatch.setattr(fs, "_SPILL_RG_ROWS", 64)
    n = 2000
    # budget = round_duration / download_delay = 8 per host per round
    cfg = CrawlConfig(pending_spill_rows=100, robots_obey=False)
    shard = fs.FrontierShard(0, cfg)
    shard.push("b0", _frontier_table("h.example", n))

    first = _scheduled_urls(shard, 0)
    assert first == [f"http://h.example/p/{i}" for i in range(8)]
    # the 1992 deferred rows compacted into the sorted base
    assert shard._base_path is not None
    assert shard._base_remaining() == n - 8
    read_after_spill = shard._spill_rows_read  # compaction itself reads 0

    rounds = 10
    for k in range(1, rounds + 1):
        got = _scheduled_urls(shard, k)
        assert got == [f"http://h.example/p/{8 * k + j}" for j in range(8)]
    # physical reads: <= 2 row groups (64 rows each) per resolve, vs a
    # 1992-row pending set — O(scheduled), not O(pending)
    phys = shard._spill_rows_read - read_after_spill
    assert phys <= rounds * 2 * 64, phys
    assert phys < (n - 8) // 2
    assert shard._base_remaining() == n - 8 * (rounds + 1)
    # accounting: status() pending matches index-derived count
    assert shard.status(rounds)["pending"] == n - 8 * (rounds + 1)


def test_pushed_rows_outrank_base_heads(ray_session, monkeypatch):
    """A higher-priority pushed row must steal a budget slot from the base
    heads; the losing head returns to pending and schedules next round."""
    monkeypatch.setattr(fs, "_SPILL_RG_ROWS", 64)
    cfg = CrawlConfig(pending_spill_rows=10, robots_obey=False)
    shard = fs.FrontierShard(0, cfg)
    shard.push("b0", _frontier_table("h.example", 100))
    first = _scheduled_urls(shard, 0)
    assert len(first) == 8 and shard._base_path is not None

    # push one URGENT row (priority 5 > 0)
    urgent = _frontier_table("h.example", 1, start=900)
    urgent = urgent.set_column(
        urgent.schema.get_field_index("priority"),
        "priority",
        pa.array([5], pa.int32()),
    )
    shard.push("b1", urgent)
    got = _scheduled_urls(shard, 1)
    assert got[0] == "http://h.example/p/900"  # urgent first
    assert got[1:] == [f"http://h.example/p/{i}" for i in range(8, 15)]
    # the displaced head (p/15) schedules first next round
    got2 = _scheduled_urls(shard, 2)
    assert got2[0] == "http://h.example/p/15"


def test_base_checkpoint_roundtrip(ray_session, tmp_path, monkeypatch):
    """checkpoint/restore must carry the FULL pending set (memory + base
    remainder) and keep scheduling byte-identical."""
    monkeypatch.setattr(fs, "_SPILL_RG_ROWS", 64)
    cfg = CrawlConfig(pending_spill_rows=50, robots_obey=False)
    a = fs.FrontierShard(0, cfg)
    a.push("b0", _frontier_table("h.example", 500))
    _scheduled_urls(a, 0)
    a.checkpoint(str(tmp_path), 0)

    b = fs.FrontierShard(0, cfg)
    b.restore(str(tmp_path))
    assert b._pending_rows() == a._pending_rows()
    for k in range(1, 4):
        assert _scheduled_urls(a, k) == _scheduled_urls(b, k)
