"""Pipeline stages: callables handed to ``Dataset.map_batches``."""
