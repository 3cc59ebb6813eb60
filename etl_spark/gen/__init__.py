"""Deterministic fixtures: binlog generator + sequential replay oracle."""
