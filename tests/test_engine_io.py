"""Tests: Pipeline/add_stage extension surface, stage registry, format-switch
IO, JSON compat codec, dedup cluster resolution."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from crawl4ai_llm_ray.engine import EngineConfig, Pipeline, register_stage
from crawl4ai_llm_ray.sources import io as eio

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_pipeline_add_stage_fn_cls_and_registry(tmp_path):
    import ray.data as rd

    # stage fn/class defined locally so cloudpickle ships them by value
    # (workers cannot import the pytest module)
    @register_stage("double_value")
    def _double(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(
            t.schema.get_field_index("value"), "value", pc.multiply(t["value"], 2.0)
        )

    class _AddConst:
        def __init__(self, c: float = 1.0):
            self.c = c

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.set_column(
                t.schema.get_field_index("value"), "value", pc.add(t["value"], self.c)
            )

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "value"])
    base = ds.to_pandas().sort_values("event_id")
    p = (
        Pipeline(ds, EngineConfig())
        .add_stage("double_value")                 # registry lookup
        .add_stage(_AddConst, concurrency=2, c=5.0)  # actor pool + ctor kwargs
    )
    out = p.dataset().to_pandas().sort_values("event_id")
    np.testing.assert_allclose(out["value"].values, base["value"].values * 2 + 5)
    # unknown stage name errors clearly
    with pytest.raises(ValueError, match="Unknown stage"):
        Pipeline(ds).add_stage("nope")


@pytest.mark.usefixtures("ray_session")
def test_format_switch_roundtrip(tmp_path):
    import ray.data as rd

    ds = rd.range(100)
    path = str(tmp_path / "out")
    eio.write_dataset(ds, path)  # auto → parquet here (no pylance)
    assert eio.storage_format("auto") == "parquet"
    back = eio.read_dataset(path)
    assert back.count() == 100
    with pytest.raises(RuntimeError):
        eio.storage_format("lance")
    with pytest.raises(ValueError):
        eio.storage_format("bogus")


@pytest.mark.usefixtures("ray_session")
def test_write_partitioned_resumable(tmp_path):
    """Per-partition atomic commit + skip-on-rerun: delete one partition,
    re-run, only that partition is rewritten and the data round-trips."""
    import os

    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda t: t.append_column("bucket", pa.array((t["doc_id"].to_numpy() % 4))),
        batch_format="pyarrow",
    )
    out = str(tmp_path / "parts")
    m1 = eio.write_partitioned(ds, out, "bucket").to_pandas()
    assert len(m1) == 4 and not m1["skipped"].any()
    # wipe one partition entirely; re-run writes ONLY it
    import shutil

    shutil.rmtree(os.path.join(out, "bucket=2"))
    m2 = eio.write_partitioned(ds, out, "bucket").to_pandas().set_index("partition")
    assert not m2.loc["2", "skipped"] and m2.drop("2")["skipped"].all()
    back = eio.read_dataset(out).to_pandas()
    orig = ds.to_pandas()
    assert sorted(back["doc_id"]) == sorted(orig["doc_id"])
    assert (
        back.sort_values("doc_id")["text"].tolist()
        == orig.sort_values("doc_id")["text"].tolist()
    )
    # crash hygiene: a stale .tmp_* dir (simulated killed task) is swept on
    # the next write and never surfaces in reads
    os.makedirs(os.path.join(out, ".tmp_9_deadbeef"), exist_ok=True)
    eio.write_partitioned(ds, out, "bucket")
    assert not [n for n in os.listdir(out) if n.startswith(".tmp_")]

    # ipc branch: partitioned arrow fragments, one partition read back
    out2 = str(tmp_path / "parts_ipc")
    m3 = eio.write_partitioned(ds, out2, "bucket", format="ipc").to_pandas()
    assert len(m3) == 4 and not m3["skipped"].any()
    one = eio.read_dataset(os.path.join(out2, "bucket=1"), format="ipc").to_pandas()
    assert sorted(one["doc_id"]) == sorted(orig[orig["doc_id"] % 4 == 1]["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_ipc_and_csv_roundtrip(tmp_path):
    """documents through the Arrow-IPC and CSV backends: same rows back,
    column projection at the IPC read."""
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n = ds.count()

    ipc_path = str(tmp_path / "ipc")
    eio.write_dataset(ds, ipc_path, format="ipc")
    back = eio.read_dataset(ipc_path, format="ipc").to_pandas()
    orig = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    back = back.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(orig, back)
    proj = eio.read_dataset(ipc_path, format="ipc", columns=["doc_id"])
    assert proj.schema().names == ["doc_id"] and proj.count() == n

    csv_path = str(tmp_path / "csv")
    # CSV chokes on embedded newlines-by-default text; export ids only
    eio.write_dataset(ds.select_columns(["doc_id"]), csv_path, format="csv")
    back_csv = eio.read_dataset(csv_path, format="csv").to_pandas()
    assert sorted(back_csv["doc_id"]) == sorted(orig["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_json_compat_codec(tmp_path):
    import json

    d = tmp_path / "recs"
    d.mkdir()
    for i in range(5):
        (d / f"r{i}.json").write_text(
            json.dumps({"id": f"r{i}", "title": f"T{i}", "price": i * 1.5})
        )
    ds = eio.read_json_records(str(d))
    cols = eio.json_payload_to_columns(ds, ["title", "price"]).to_pandas()
    assert sorted(cols["title"]) == [f"T{i}" for i in range(5)]
    out = str(tmp_path / "export")
    eio.write_json_records(ds, out)
    import os

    assert any(f.endswith(".json") for f in os.listdir(out))


@pytest.mark.usefixtures("ray_session")
def test_dedup_clusters_consistent_with_pairs():
    from crawl4ai_llm_ray.pipelines import dedup

    clusters = dedup.dedup_clusters(SF).to_pandas()
    pairs = dedup.minhash_lsh_pairs(SF).to_pandas()
    lab = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        assert lab[a] == lab[b]  # connected docs share a cluster
    # exactly one keeper per cluster
    keep = clusters[clusters["keep"]]
    assert keep["cluster_id"].is_unique
    assert set(keep["cluster_id"]) == set(clusters["cluster_id"].unique())


@pytest.mark.usefixtures("ray_session")
def test_llm_config_threads_to_extraction_stage():
    """EngineConfig.llm (reference LLMConfig analog, config.py:64-88) reaches
    the TextEmbedder actor: a different model name must produce different
    embeddings (different stub seed), same name identical ones."""
    import numpy as np
    import ray.data as rd

    from crawl4ai_llm_ray.engine import EngineConfig, ModelSettings, Pipeline

    rows = [{"doc_id": i, "text": f"alpha beta gamma delta {i}"} for i in range(8)]

    def run(model_name):
        cfg = EngineConfig(llm=ModelSettings(model=model_name, options={"dim": 16}))
        p = Pipeline(rd.from_items(rows), config=cfg).add_extraction_stage(
            batch_size=8, concurrency=1
        )
        out = {r["doc_id"]: np.asarray(r["embedding"]) for r in p.dataset().take_all()}
        return out

    a1 = run("model-a")
    a2 = run("model-a")
    b = run("model-b")
    assert all(v.shape == (16,) for v in a1.values())
    for k in a1:
        assert np.allclose(a1[k], a2[k])
    assert any(not np.allclose(a1[k], b[k]) for k in a1)


def test_model_settings_defaults():
    from crawl4ai_llm_ray.engine import EngineConfig

    cfg = EngineConfig()
    assert cfg.llm.provider == "local"
    assert cfg.llm.temperature == 0.0
    assert cfg.llm.cache_dir
    from crawl4ai_llm_ray.pipelines.multimodal import PayloadDecoder

    d = PayloadDecoder(model_settings=cfg.llm)
    assert d.cache_dir == cfg.llm.cache_dir


class TestLanceBranchContract:
    """The north star stores tables as Lance; pylance is absent from this
    sandbox (documented in BASELINE.md), so the ``format="lance"`` branch in
    sources/io.py is pinned here with a mock backend: the exact call
    contract (write_lance / read_lance dispatch, the _versions marker probe,
    the parquet fallback, the not-installed error) is asserted without the
    real library."""

    def test_auto_prefers_lance_when_importable(self, monkeypatch):
        monkeypatch.setattr(eio, "HAVE_LANCE", True)
        assert eio.storage_format("auto") == "lance"
        monkeypatch.setattr(eio, "HAVE_LANCE", False)
        assert eio.storage_format("auto") == "parquet"

    def test_lance_requested_but_missing_raises(self, monkeypatch):
        monkeypatch.setattr(eio, "HAVE_LANCE", False)
        with pytest.raises(RuntimeError, match="pylance not installed"):
            eio.storage_format("lance")

    def test_write_dispatches_to_write_lance(self, monkeypatch, tmp_path):
        monkeypatch.setattr(eio, "HAVE_LANCE", True)
        calls = {}

        class FakeDS:
            def write_lance(self, path, **kw):
                calls["lance"] = (path, kw)

            def write_parquet(self, path, **kw):  # must NOT be hit
                calls["parquet"] = (path, kw)

        target = str(tmp_path / "t")
        out = eio.write_dataset(FakeDS(), target, format="lance", max_rows_per_file=7)
        assert out == target
        assert calls == {"lance": (target, {"max_rows_per_file": 7})}

    def test_read_dispatches_on_versions_marker(self, monkeypatch, tmp_path):
        import ray.data as rd

        monkeypatch.setattr(eio, "HAVE_LANCE", True)
        root = tmp_path / "t"
        (root / "_versions").mkdir(parents=True)
        monkeypatch.setattr(
            rd, "read_lance", lambda path, columns=None, **kw: ("lance", path, columns)
        )
        got = eio.read_dataset(str(root), format="lance", columns=["doc_id"])
        assert got == ("lance", str(root), ["doc_id"])

    def test_read_without_versions_falls_back_to_parquet(self, monkeypatch, tmp_path):
        """A directory without Lance's _versions marker is a parquet fragment
        dir (the fallback layout) even when lance is importable."""
        import ray.data as rd

        monkeypatch.setattr(eio, "HAVE_LANCE", True)
        root = tmp_path / "t"
        root.mkdir()
        monkeypatch.setattr(
            rd, "read_parquet", lambda path, columns=None, **kw: ("parquet", path, columns)
        )
        got = eio.read_dataset(str(root), format="lance", columns=["a"])
        assert got == ("parquet", str(root), ["a"])
