"""Operator modules (explicit __init__ so the package zipimports
cleanly under spark-submit --py-files)."""
