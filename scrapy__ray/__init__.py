"""scrapy__ray — a from-scratch Ray-Data-native crawl + data-processing engine.

Re-expresses the query/data-processing capabilities of the reference crawler
(kunsnat/scrapy-, a fork of Scrapy) on idiomatic Ray Data: Dataset pipelines,
zero-copy Arrow batches, actor pools for stateful stages, an explicit
host-hash-partitioned URL frontier with a sharded seen-set, and a round-based
BSP crawl loop replacing the reference's single-process Twisted event loop.

Blueprint: SURVEY.md.  Fixture/corpus spec: FIXTURES.md (frozen).
Reference provenance caveat: /root/reference was empty at survey time
(SURVEY.md §0); upstream-Scrapy symbol citations are used instead.
"""

__version__ = "0.1.0"
