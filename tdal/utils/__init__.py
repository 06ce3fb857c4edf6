"""Utilities: FLOPs accounting, misc."""
