"""Engine configuration + pipeline extension surface (SURVEY §2.10).

Mirrors the reference's pydantic config models (``/root/reference/
crawl4ai_llm/config.py:11-108`` — StorageConfig/CrawlerConfig/AppConfig as
the public API) and its registry pattern (``factory.py:18-20``), adapted to
the Ray engine: a dataclass config, a stage registry, and a ``Pipeline``
builder whose ``add_stage`` hook accepts a vectorized batch function or a
stateful callable class (becomes a map_batches actor pool).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any


@dataclass
class StorageSettings:
    """Reference StorageConfig analog (config.py:11-32)."""

    path: str = "/tmp/crawl4ai_llm_ray_store"
    format: str = "auto"  # lance | parquet | auto
    options: dict = field(default_factory=dict)


@dataclass
class CrawlerSettings:
    """Reference CrawlerConfig analog (config.py:35-62): the politeness/
    retry contract the frontier enforces."""

    delay: float = 1.0          # seconds between same-host requests (:56)
    timeout: float = 30.0       # (:54) — a real fetcher's budget
    max_retries: int = 3        # (:55)
    user_agent: str = "crawl4ai_llm_ray/0.1"
    headers: dict = field(default_factory=dict)  # (:57) extra HTTP headers
    proxy: str | None = None    # (:58) proxy URL
    verify_ssl: bool = True     # (:59)
    n_partitions: int = 8
    wave_duration: float = 8.0
    options: dict = field(default_factory=dict)


@dataclass
class ModelSettings:
    """Reference LLMConfig analog (config.py:64-88): the extraction-stage
    model configuration. Consumed by the extraction actors — threaded into
    ``TextEmbedder`` (model name selects the deterministic stub's seed /
    dimensions) and ``PayloadDecoder`` (cache_dir, options) via
    ``Pipeline.add_extraction_stage``; a real encoder would read provider /
    api_key / temperature the same way."""

    provider: str = "local"
    model: str = "stub-embedder"
    api_key: str | None = None
    temperature: float = 0.0
    max_tokens: int = 4000
    top_p: float = 1.0
    cache_dir: str = "/tmp/crawl4ai_llm_ray_cache"
    options: dict = field(default_factory=dict)


@dataclass
class EngineConfig:
    """Reference AppConfig analog (config.py:91-108)."""

    storage: StorageSettings = field(default_factory=StorageSettings)
    crawler: CrawlerSettings = field(default_factory=CrawlerSettings)
    llm: ModelSettings = field(default_factory=ModelSettings)
    settings: dict = field(default_factory=dict)


STAGE_REGISTRY: dict[str, Any] = {}


def register_stage(name: str):
    """Decorator: register a batch function / callable class as a named,
    user-invocable pipeline stage (the reference's STORAGE_REGISTRY pattern
    generalized to transforms)."""

    def deco(fn_or_cls):
        STAGE_REGISTRY[name] = fn_or_cls
        return fn_or_cls

    return deco


class Pipeline:
    """Dataset pipeline builder with the add_stage extension hook.

    ``add_stage(fn)`` — stateless vectorized batch transform (tasks);
    ``add_stage(Cls, concurrency=N)`` — stateful stage (actor pool, setup in
    ``__init__`` once per actor);
    ``add_stage("name")`` — look up a registered stage.
    """

    def __init__(self, ds, config: EngineConfig | None = None):
        self.ds = ds
        self.config = config or EngineConfig()

    def add_stage(
        self,
        stage,
        *,
        batch_format: str = "pyarrow",
        batch_size: int | None = None,
        concurrency=None,
        num_cpus: float | None = None,
        **fn_kwargs,
    ) -> "Pipeline":
        if isinstance(stage, str):
            if stage not in STAGE_REGISTRY:
                raise ValueError(
                    f"Unknown stage '{stage}' (registered: {sorted(STAGE_REGISTRY)})"
                )
            stage = STAGE_REGISTRY[stage]
        kwargs: dict[str, Any] = {"batch_format": batch_format}
        if batch_size is not None:
            kwargs["batch_size"] = batch_size
        if num_cpus is not None:
            kwargs["num_cpus"] = num_cpus
        if inspect.isclass(stage):
            kwargs["concurrency"] = concurrency or 2
            if fn_kwargs:
                kwargs["fn_constructor_kwargs"] = fn_kwargs
        else:
            if concurrency is not None:
                kwargs["concurrency"] = concurrency
            if fn_kwargs:
                kwargs["fn_kwargs"] = fn_kwargs
        self.ds = self.ds.map_batches(stage, **kwargs)
        return self

    def add_extraction_stage(
        self,
        stage_cls=None,
        *,
        batch_size: int | None = 1024,
        concurrency=2,
        num_cpus: float | None = 1,
    ) -> "Pipeline":
        """Add a model-extraction actor stage configured from
        ``config.llm`` (the reference LLMConfig surface): the model name /
        cache_dir / options are threaded into the actor's ``__init__``
        (once per actor), exactly where a real provider client would be
        constructed. Defaults to the TextEmbedder stub."""
        if stage_cls is None:
            from .pipelines.multimodal import TextEmbedder

            stage_cls = TextEmbedder
        return self.add_stage(
            stage_cls,
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=num_cpus,
            model_settings=self.config.llm,
        )

    def dataset(self):
        return self.ds

    def write(self, path: str | None = None):
        from .sources.io import write_dataset

        target = path or self.config.storage.path
        return write_dataset(self.ds, target, format=self.config.storage.format)
