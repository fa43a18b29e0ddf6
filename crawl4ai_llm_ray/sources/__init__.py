"""Sources: synthetic web corpus generator and parquet IO helpers."""
