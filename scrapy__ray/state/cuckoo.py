"""Cuckoo filter from scratch (SURVEY.md §2.2 D3, north-rule-mandated).

Partial-key cuckoo hashing per Fan et al., "Cuckoo Filter: Practically Better
Than Bloom" (CoNEXT 2014, public): 4-slot buckets, 16-bit fingerprints,
bucket count a power of two, alternate index ``i2 = i1 XOR hash(fp)``,
bounded eviction (500 kicks) with an exact overflow stash so inserts never
fail (the stash also absorbs the tiny tail that pure cuckoo filters reject).

Replaces the reference's unbounded in-memory ``set`` dupefilter
(``scrapy/dupefilters.py::RFPDupeFilter``) at 10^10-URL scale: ~2.1 bytes/URL
at 95% load vs ~60+ bytes for a Python set entry.  False positives wrongly
drop URLs, so correctness fixtures run mode="exact" and bench runs cuckoo
with the measured FP rate reported (SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

import hashlib
import pickle
import random

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500


def _h64(item: bytes) -> int:
    # items are already SHA1 fingerprints — fold them instead of re-hashing
    if len(item) >= 16:
        return int.from_bytes(item[:8], "little") ^ int.from_bytes(item[8:16], "little")
    return int.from_bytes(hashlib.blake2b(item, digest_size=8).digest(), "little")


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 16, seed: int = 42):
        nb = 1
        while nb * _SLOTS < capacity:
            nb <<= 1
        self.num_buckets = nb
        self.mask = nb - 1
        self.table = np.zeros((nb, _SLOTS), dtype=np.uint16)
        self.stash: set[tuple[int, int]] = set()  # (i1, fp) overflow
        self.count = 0
        self._rng = random.Random(seed)

    # -- hashing ------------------------------------------------------------
    def _fp_and_index(self, item: bytes) -> tuple[int, int]:
        h = _h64(item)
        fp = (h >> 48) & 0xFFFF
        if fp == 0:
            fp = 1
        return fp, h & self.mask

    def _alt_index(self, i: int, fp: int) -> int:
        # hash the fingerprint with a cheap integer mix (splitmix-ish)
        z = (fp * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z ^= z >> 29
        return (i ^ z) & self.mask

    # -- operations ---------------------------------------------------------
    def __contains__(self, item: bytes) -> bool:
        fp, i1 = self._fp_and_index(item)
        row = self.table[i1]
        if fp in row:
            return True
        i2 = self._alt_index(i1, fp)
        if fp in self.table[i2]:
            return True
        return (min(i1, i2), fp) in self.stash

    def add(self, item: bytes) -> None:
        fp, i1 = self._fp_and_index(item)
        i2 = self._alt_index(i1, fp)
        # already present (as far as the filter can tell) -> idempotent no-op
        if fp in self.table[i1] or fp in self.table[i2] or (min(i1, i2), fp) in self.stash:
            return
        self.count += 1
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                return
        # evict: random walk up to _MAX_KICKS
        i = self._rng.choice((i1, i2))
        cur = fp
        for _ in range(_MAX_KICKS):
            slot = self._rng.randrange(_SLOTS)
            cur, self.table[i][slot] = int(self.table[i][slot]), cur
            i = self._alt_index(i, cur)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = cur
                return
        # give up -> exact stash (never lose an insert)
        j = self._alt_index(i, cur)
        self.stash.add((min(i, j), cur))

    def __len__(self) -> int:
        return self.count

    @property
    def load_factor(self) -> float:
        return self.count / (self.num_buckets * _SLOTS)

    # -- checkpointing ------------------------------------------------------
    def serialize(self) -> bytes:
        return pickle.dumps(
            {
                "table": self.table,
                "stash": self.stash,
                "count": self.count,
                "rng": self._rng.getstate(),
            },
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "CuckooFilter":
        d = pickle.loads(data)
        f = cls(capacity=d["table"].shape[0] * _SLOTS)
        f.table = d["table"]
        f.stash = d["stash"]
        f.count = d["count"]
        f._rng.setstate(d["rng"])
        return f
