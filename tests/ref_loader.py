"""Import helper for the read-only reference implementation at /root/reference.

The reference's ``game/tetris.py`` does ``from tetris_algo_main import main``,
so both /root/reference and /root/reference/game must be on sys.path. Kept in
a helper so parity tests can be skipped cleanly when the reference is absent.
"""

import sys

REF_ROOT = "/root/reference"
REF_GAME = "/root/reference/game"


def load_reference():
    for p in (REF_ROOT, REF_GAME):
        if p not in sys.path:
            sys.path.insert(0, p)
    import tetris as ref_tetris  # /root/reference/game/tetris.py
    return ref_tetris


def load_reference_algo():
    for p in (REF_ROOT, REF_GAME):
        if p not in sys.path:
            sys.path.insert(0, p)
    from tetris_algo_main.TetrisGameGenerator import TetrisGameGenerator
    from tetris_algo_main.TetrisSolver import TetrisSolver
    from tetris_algo_main import main
    return TetrisGameGenerator, TetrisSolver, main
