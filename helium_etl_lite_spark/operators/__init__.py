"""Reusable operator implementations composed from DataFrame primitives."""
