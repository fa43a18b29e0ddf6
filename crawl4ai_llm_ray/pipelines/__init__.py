"""Pipelines: the crawl driver and the data-processing operator suites."""
