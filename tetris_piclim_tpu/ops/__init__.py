"""Low-level fixed-shape compute paths.

:mod:`.bitboard` — the packed-bitboard env step: boards as 10 uint32 column
bitmasks, drop/lock/line-clear as pure vector bit arithmetic (no sorts, no
per-env dynamic gathers). This is the production hot path; the array engine
in :mod:`tetris_piclim_tpu.engine` is the readable parity-reference
implementation, and the two are proven step-equivalent by
tests/test_bitboard.py.
"""

from . import bitboard
