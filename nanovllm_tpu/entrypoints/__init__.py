"""Serving entrypoints (beyond the reference, which ships offline
example.py/bench.py only): an online continuous-batching HTTP server."""
