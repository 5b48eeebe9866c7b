"""Engine operators: relational scaffolding + hdstats kernel aggregates."""
