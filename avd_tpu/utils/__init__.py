"""Shared utilities: JAX runtime setup, env helpers, timing."""
