"""Final-aggregation helper for the partial-aggregate (combiner) pattern.

After a vectorized per-batch partial aggregation, the surviving rows number
one-per-(key, batch) — usually thousands, not billions. Ray Data's generic
``groupby(...).aggregate(...)`` runs a sort-based shuffle whose constant
factors dwarf such inputs (measured: 20 s for 3.6k rows on 2 string+int
keys). ``final_agg`` instead coalesces the partials to one block
(``repartition(1)`` — no row movement beyond concatenation) and finishes with
a single vectorized pandas groupby.

Scale guidance: this is the right plan whenever the DISTINCT KEY COUNT fits
one node (dimension-like keys: flags, hosts, hours...). If the key space
itself is huge (e.g. url_hash), keep the partials keyed and use
``groupby().map_groups`` / the frontier's hash-partitioned actors instead —
the combiner already shrank the data, so the shuffle moves partials, not raw
rows, either way.
"""

from __future__ import annotations

import pandas as pd


def final_agg(partials, keys: list[str], sums: dict[str, str], finalize=None):
    """Sum the ``sums`` columns (out_name → partial_col) per ``keys`` over the
    coalesced partials; ``finalize(df) -> df`` runs after aggregation."""

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False).agg(
            **{out: (src, "sum") for out, src in sums.items()}
        )
        return finalize(g) if finalize is not None else g

    return partials.repartition(1).map_batches(
        agg, batch_format="pandas", batch_size=None
    )


def isin_sorted(keys, vals):
    """Vectorized membership of ``vals`` in the SORTED array ``keys`` —
    the searchsorted+clip+equality idiom shared by the broadcast semi/anti
    joins (it was hand-copied six times with drifting empty-array guards;
    the unguarded copies crashed on an empty key set: np.clip(idx, 0, -1)
    then keys[-1] on a length-0 array)."""
    import numpy as np

    if len(keys) == 0:
        return np.zeros(len(vals), dtype=bool)
    idx = np.clip(np.searchsorted(keys, vals), 0, len(keys) - 1)
    return keys[idx] == vals
