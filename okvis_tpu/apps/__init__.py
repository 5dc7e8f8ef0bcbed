"""CLI applications (TPU equivalent of okvis_apps)."""
