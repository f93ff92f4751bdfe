"""Table parity: the canonical tables must match all three reference copies."""

import numpy as np

from tetris_piclim_tpu import tables
from ref_loader import load_reference, load_reference_algo


def test_engine_tables_match_reference():
    ref = load_reference()
    for pid in range(7):
        ref_rots = ref.tetrominos[pid]
        assert int(tables.NROT[pid]) == len(ref_rots)
        for r in range(8):  # includes wrap-around behavior
            ref_mask, ref_topo = ref.get_tetromino(pid, r)
            mask, topo = tables.get_tetromino(pid, r)
            np.testing.assert_array_equal(mask, ref_mask)
            assert topo == tuple(ref_topo)


def test_piece_id_order_matches_translations():
    ref = load_reference()
    for name, pid in ref.piece_translations.items():
        assert tables.PIECE_IDS[name] == pid


def test_generator_tables_match_reference():
    gen_cls, solver_cls, _ = load_reference_algo()
    for name, rots in gen_cls.tetromino_shapes.items():
        ours = tables.GEN_SHAPES[name]
        assert len(ours) == len(rots)
        for a, b in zip(ours, rots):
            np.testing.assert_array_equal(a, np.array(b))
    # solver table is a third identical copy in the reference
    for name, rots in solver_cls.tetromino_shapes.items():
        for a, b in zip(tables.GEN_SHAPES[name], rots):
            np.testing.assert_array_equal(a, np.array(b))


def test_rtopo_is_lowest_filled_row():
    for pid in range(7):
        for r in range(int(tables.NROT[pid])):
            mask, topo = tables.get_tetromino(pid, r)
            for c in range(mask.shape[1]):
                filled = np.flatnonzero(mask[:, c])
                assert topo[c] == filled[-1]
