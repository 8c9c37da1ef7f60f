"""Operator library — thin, tested, Catalyst-friendly DataFrame
transforms covering the reference inventory (SURVEY §2) plus the
analytics and training-data-pipeline layers built on top."""
