"""Composable end-to-end jobs (reference lifecycle §3)."""
