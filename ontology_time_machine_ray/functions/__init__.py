"""Pure scalar/vector functions used inside ``map_batches`` stages."""
