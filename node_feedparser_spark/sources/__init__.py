"""Sources/sinks: transcript scan, snapshot manifest (Iceberg emulation)."""
