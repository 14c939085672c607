"""Phase trainers, renderers, checkpointing, and the phase state machine."""
