"""Sources & sinks (SURVEY.md §2.1): corpus fixture generator, seed lists,
driver-testdata loaders, and the snapshotted-table layer (Iceberg fallback)."""
