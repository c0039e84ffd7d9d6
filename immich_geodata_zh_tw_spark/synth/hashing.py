"""SplitMix64-style arithmetic hashing for coordination-free determinism.

Distributed generators can't share RNG state across partitions; instead every
row derives its randomness from its own id via a public mixing function
(SplitMix64 finalizer, Steele et al., "Fast Splittable Pseudorandom Number
Generators", OOPSLA 2014).  Pure numpy uint64, vectorized.
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x) -> np.ndarray:
    z = (np.asarray(x).astype(np.uint64) + _GOLDEN) * np.uint64(1)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def u01(ids, salt: int = 0) -> np.ndarray:
    """Uniform [0, 1) doubles keyed by (id, salt)."""
    with np.errstate(over="ignore"):
        mixed = splitmix64(np.asarray(ids).astype(np.uint64)
                           * np.uint64(0x2545F4914F6CDD1D) + np.uint64(salt))
    return (mixed >> np.uint64(11)).astype(np.float64) / float(1 << 53)
