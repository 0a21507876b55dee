"""Multi-chip sharding: mesh construction and sharded MSM/IPA stages over
jax.sharding + shard_map with ICI collectives."""
