"""PRNG plumbing: one root key, a split tree, optional host-RNG seeding.

The reference seeds four global RNGs once (torch / cuda / numpy / random,
reference src/utils/util_general.py:224-237) and then draws from implicit
global state everywhere. A jitted TPU program cannot use implicit state, so
this module provides a `KeyChain`: a deterministic, replay-safe stream of
`jax.random` keys addressed by name + counter. Every consumer (swarm init,
velocity noise, label smoothing, data shuffles, weight init) derives its
stream from the single experiment seed, so an entire run is reproducible
from `(seed,)` alone and any stage can be replayed in isolation.
"""

from __future__ import annotations

import random
from typing import Iterator

import jax
import numpy as np


def seed_all(seed: int) -> "KeyChain":
    """Seed host RNGs (numpy/python — used only by host-side analysis and
    torch-free data shuffles) and return the device KeyChain.

    Mirrors the intent of reference src/utils/util_general.py:224-237 without
    any global torch/cudnn state: device randomness flows exclusively through
    the returned KeyChain.
    """
    random.seed(seed)
    np.random.seed(seed)
    return KeyChain(seed)


class KeyChain:
    """Named, counted streams of PRNG keys derived from one root seed.

    >>> keys = KeyChain(42)
    >>> k1 = keys("swarm_init")      # first key of the stream
    >>> k2 = keys("swarm_init")      # next key, never repeats
    >>> kc2 = keys.child("class_3")  # independent subtree

    Streams are independent: calls on one stream never perturb another, so
    adding a new consumer does not reshuffle existing trajectories (unlike
    the reference's single global numpy stream where insertion order of
    np.random calls changes every downstream draw).
    """

    def __init__(self, seed_or_key, _name: str = ""):
        if isinstance(seed_or_key, int):
            self._root = jax.random.key(seed_or_key)
        else:
            self._root = seed_or_key
        self._name = _name
        self._counters: dict[str, int] = {}

    def __call__(self, stream: str) -> jax.Array:
        n = self._counters.get(stream, 0)
        self._counters[stream] = n + 1
        return jax.random.fold_in(jax.random.fold_in(self._root, _h(stream)), n)

    def peek(self, stream: str) -> jax.Array:
        """Next key of the stream without consuming it."""
        n = self._counters.get(stream, 0)
        return jax.random.fold_in(jax.random.fold_in(self._root, _h(stream)), n)

    def child(self, name: str) -> "KeyChain":
        """Independent subtree (e.g. one per IiD class / per OoD patient)."""
        return KeyChain(jax.random.fold_in(self._root, _h(name)), _name=name)

    def stream(self, stream: str) -> Iterator[jax.Array]:
        while True:
            yield self(stream)

    def state(self) -> dict[str, int]:
        """Counters for checkpointing; restore with `restore()`."""
        return dict(self._counters)

    def restore(self, counters: dict[str, int]) -> None:
        self._counters = dict(counters)


def _h(s: str) -> int:
    """Stable 31-bit hash of a stream name (Python's hash() is salted)."""
    h = 2166136261
    for b in s.encode():
        h = ((h ^ b) * 16777619) & 0x7FFFFFFF
    return h
