"""``python -m face_hunter_spark`` — the unified CLI (see cli.py)."""
from .cli import main

raise SystemExit(main())
