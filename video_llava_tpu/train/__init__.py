"""Training: optax loop with projector-only tuning parity, masked CE,
sharded (DP x TP / FSDP) train step, Orbax checkpointing."""
