"""Deterministic randomness plumbing.

The reference seeds a global mt19937 from ``std::random_device``
(LifeAPI.hpp:18-23) — nondeterministic by design.  The framework replaces
that with explicit, splittable ``jax.random`` keys threaded through every
API (SURVEY.md section 5.6); these helpers keep call sites tidy."""

from __future__ import annotations

import jax


class KeySequence:
    """Stateful convenience wrapper: ks = KeySequence(0); k = ks()."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def __call__(self):
        self._key, out = jax.random.split(self._key)
        return out

    def split(self, n):
        self._key, *keys = jax.random.split(self._key, n + 1)
        return keys


def fold_in(key, *data):
    for d in data:
        key = jax.random.fold_in(key, d)
    return key
