"""Multi-chip scaling: meshes, time/neuron sharding, sweep fan-out."""
