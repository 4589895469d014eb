"""Query plans: the driver-facing query inventory, search pipeline,
deterministic query optimizer, golden-query harness."""
