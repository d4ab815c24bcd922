"""Multi-chip sharding: meshes, sharded MSM (psum) and distributed NTT."""
