"""Scalar/column helper functions — native Column expressions only."""
