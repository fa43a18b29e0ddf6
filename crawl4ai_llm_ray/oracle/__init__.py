"""Reference-faithful single-process oracle crawler (golden outputs)."""
