"""URL-seen set abstraction — exact (oracle-equivalent) or cuckoo (scale) mode.

Replaces ``scrapy/dupefilters.py::RFPDupeFilter``'s process-wide Python set.
One SeenSet lives inside each FrontierShard actor; test-and-insert is the
anti-join-plus-insert of SURVEY.md §2.7.  Cuckoo mode optionally keeps the
exact fingerprint sidecar (verification mode) so the false-positive rate can
be measured and seen-set equality proven against the oracle.
"""

from __future__ import annotations

import pickle

from scrapy__ray.state.cuckoo import CuckooFilter


class SeenSet:
    def __init__(
        self,
        mode: str = "exact",
        capacity: int = 1 << 16,
        keep_exact_sidecar: bool = True,
    ):
        assert mode in ("exact", "cuckoo")
        self.mode = mode
        self._set: set[bytes] = set()
        self._cuckoo = CuckooFilter(capacity) if mode == "cuckoo" else None
        self._sidecar = keep_exact_sidecar
        self.false_positive_checks = 0  # cuckoo "seen" where sidecar says unseen

    def check_and_insert(self, fp: bytes) -> bool:
        """True if fp was already seen; inserts it either way (idempotent)."""
        if self.mode == "exact":
            if fp in self._set:
                return True
            self._set.add(fp)
            return False
        seen = fp in self._cuckoo
        if seen and self._sidecar and fp not in self._set:
            self.false_positive_checks += 1
        if not seen:
            self._cuckoo.add(fp)
        if self._sidecar:
            self._set.add(fp)
        return seen

    def insert(self, fp: bytes) -> None:
        if self.mode == "cuckoo":
            if fp not in self._cuckoo:
                self._cuckoo.add(fp)
            if self._sidecar:
                self._set.add(fp)
        else:
            self._set.add(fp)

    def __len__(self) -> int:
        return len(self._set) if (self.mode == "exact" or self._sidecar) else len(self._cuckoo)

    def exact_fingerprints(self) -> set[bytes]:
        return set(self._set)

    def serialize(self) -> bytes:
        return pickle.dumps(
            {
                "mode": self.mode,
                "set": self._set,
                "cuckoo": self._cuckoo.serialize() if self._cuckoo else None,
                "sidecar": self._sidecar,
                "fp_checks": self.false_positive_checks,
            },
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "SeenSet":
        d = pickle.loads(data)
        s = cls(mode=d["mode"], keep_exact_sidecar=d["sidecar"])
        s._set = d["set"]
        if d["cuckoo"] is not None:
            s._cuckoo = CuckooFilter.deserialize(d["cuckoo"])
        s.false_positive_checks = d["fp_checks"]
        return s
