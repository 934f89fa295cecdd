"""Ray Data stages: map_batches wrappers (stateless fns + actor pools)."""
