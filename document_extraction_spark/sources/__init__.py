"""Sources: deterministic transcript synthesis + table IO abstraction."""
