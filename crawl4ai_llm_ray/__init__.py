"""crawl4ai_llm_ray — a Ray-Data-native crawl frontier, fetch scheduler and
data-processing engine, built from scratch with the capabilities of the
reference system 702ron/crawl4ai_llm (see SURVEY.md).

Everything here is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, actor pools for stateful stages
(URL-seen cuckoo filters, politeness clocks), and explicit partitioning by
host-hash for the wide steps.  No module in this package calls ``ray.init()`` —
the embedding application (driver, tests, bench.py) owns the Ray session.
"""

__version__ = "0.1.0"
