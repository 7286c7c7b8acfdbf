"""Storage backends: the default plain-Parquet stage-and-swap layout plus
the versioned commit-log backend (OCC + time travel)."""
