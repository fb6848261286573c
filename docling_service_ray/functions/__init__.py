"""Vectorized scalar helpers shared by stages and queries."""
