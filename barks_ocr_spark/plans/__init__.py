"""Query plans: the driver-facing registry of operators with oracles."""
