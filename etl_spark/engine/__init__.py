"""CDC engine: parse -> normalize -> resolve -> evolve -> merge -> lineage."""
