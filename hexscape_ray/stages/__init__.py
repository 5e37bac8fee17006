"""Ray Data stages: stateless ``map_batches`` functions and actor-pool
callable classes. Nothing in here owns a Ray session."""
