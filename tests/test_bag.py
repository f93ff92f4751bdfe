"""7-bag randomizer properties — the reference's own test intents
(reference game/main.py:7-29) plus the on-device batched variant."""

import random

import jax
import numpy as np

from tetris_piclim_tpu.gen.bag import SevenBag, bag_sequences_device


def test_refill_signal_fires_every_seventh_draw():
    """reference game/main.py:7-18: the refill flag fires exactly when the
    bag regenerates; bag size decrements on remove."""
    bag = SevenBag(random.Random(0))
    for round_ in range(3):
        for i in range(7):
            piece, idx, refilled = bag.draw()
            assert refilled == (i == 0)
            assert len(bag) == 7 - i
            bag.remove(idx)
        assert len(bag) == 0


def test_failed_draw_does_not_consume():
    bag = SevenBag(random.Random(1))
    p1, idx, _ = bag.draw()
    # no remove() — the piece stays available (carve-failure semantics)
    assert len(bag) == 7
    remaining = set(bag.pieces)
    assert p1 in remaining


def test_sequence_is_true_bag_randomizer():
    """reference game/main.py:20-29: exact length; every 7-aligned window
    is duplicate-free."""
    bag = SevenBag(random.Random(2))
    seq = bag.sequence(16)
    assert len(seq) == 16
    for start in range(0, 14, 7):
        window = seq[start : start + 7]
        assert len(set(window)) == len(window)


def test_device_bag_sequences():
    seqs = np.asarray(bag_sequences_device(jax.random.PRNGKey(0), 64, 21))
    assert seqs.shape == (64, 21)
    for row in seqs:
        for start in range(0, 21, 7):
            window = row[start : start + 7]
            assert sorted(window.tolist()) == list(range(7))
    # rows differ (independent sequences)
    assert len({tuple(r) for r in seqs.tolist()}) > 32
