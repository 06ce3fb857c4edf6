"""Data layer: Waymo-format schema, track datasets, synthetic fabrication."""
