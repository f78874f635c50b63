"""Plans: the query catalog (driver contract) and pipeline runner."""
