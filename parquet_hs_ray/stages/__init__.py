"""map_batches stages (stateless tasks and stateful actor-pool classes)."""
