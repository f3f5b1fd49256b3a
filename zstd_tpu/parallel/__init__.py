"""Multi-chip / multi-host sharded decode. Populated by the M3 milestone."""
