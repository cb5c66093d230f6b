"""Sources & sinks: synthetic transcript generator, TableIO seam (parquet
emulation of Iceberg bucket/days partitioning), Turtle golden-file I/O."""
