"""Round-4 second batch: market-basket co-occurrence, time-series gap-fill,
count-min-sketch heavy hitters, grouped mode."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_cooccur_parts_hand_built(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational4 as r4

    # order 1: parts {1,2,3} -> pairs (1,2)(1,3)(2,3); order 2: {1,2} ->
    # (1,2); order 3: {1,2} dup lines -> still (1,2). (1,2) co-occurs 3x.
    rows = [
        (1, 1), (1, 2), (1, 3),
        (2, 2), (2, 1),
        (3, 1), (3, 2), (3, 2),
    ]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        f"{tmp_path}/lineitem.parquet",
    )
    got = _df(r4.cooccur_parts(str(tmp_path), k=10))
    assert got.iloc[0].tolist() == [1, 2, 3]
    as_set = {(r.p1, r.p2): r.n_orders for r in got.itertuples()}
    assert as_set == {(1, 2): 3, (1, 3): 1, (2, 3): 1}


@pytest.mark.usefixtures("ray_session")
def test_cooccur_parts_basket_cap(tmp_path):
    from crawl4ai_llm_ray.pipelines import relational4 as r4

    # order 1 has 5 distinct parts (over cap=4) -> contributes nothing;
    # order 2 has 2 -> one pair
    rows = [(1, p) for p in range(1, 6)] + [(2, 7), (2, 8)]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        f"{tmp_path}/lineitem.parquet",
    )
    got = _df(r4.cooccur_parts(str(tmp_path), k=10, max_basket=4))
    assert len(got) == 1
    assert got.iloc[0].tolist() == [7, 8, 1]
