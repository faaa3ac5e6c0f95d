"""Measurement / analysis tools (not part of the installed package)."""
