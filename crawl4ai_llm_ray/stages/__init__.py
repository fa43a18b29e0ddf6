"""Ray Data stages: stateless map_batches transforms and actor-pool workers."""
