"""``python -m tetris_piclim_tpu`` → the CLI."""

from .cli import main

raise SystemExit(main())
