"""Host-side media ingest: probing, frame batches, audio, container parsing.

This is the only layer that touches files and external decoders.  Everything
downstream operates on numpy / JAX arrays with static shapes.
"""
