"""Minibatch streams without tf.data.

The reference shuffles + repeats + batches through ``tf.data``
(utils.py:45-55).  The JAX-native equivalent is a host-side generator over
PRNG-permuted index epochs: the data stays as two device arrays and each batch
is a cheap gather, so nothing is copied host-side per step and batches have a
single static shape for ``jit``.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def minibatch_iterator(
    key: jax.Array,
    data: Tuple[Array, Array],
    batch_size: int,
    drop_remainder: bool = True,
) -> Iterator[Tuple[Array, Array]]:
    """Infinite shuffled minibatch stream (reference utils.py:45-55 semantics).

    Epoch order is drawn from a numpy generator seeded off ``key`` (host-side
    shuffling; the gathers themselves run on device).  With
    ``drop_remainder=True`` every batch has the same static shape, so the
    training step compiles once.
    """
    x, y = data
    n = x.shape[0]
    if drop_remainder:
        for idx_block in minibatch_index_iterator(key, n, batch_size, 1):
            idx = idx_block[0]
            yield x[idx], y[idx]
        return
    batch_size = min(int(batch_size), n)
    seed = int(jax.random.randint(key, (), 0, np.iinfo(np.int32).max))
    rng = np.random.default_rng(seed)
    while True:
        perm = rng.permutation(n)
        for start in range(0, n, batch_size):
            idx = jnp.asarray(perm[start : start + batch_size])
            yield x[idx], y[idx]


def batched_indices(n: int, batch_size: int) -> Iterator[np.ndarray]:
    """Sequential index batches for full-dataset evaluation passes."""
    for start in range(0, n, batch_size):
        yield np.arange(start, min(start + batch_size, n))


def minibatch_index_iterator(
    key: jax.Array,
    n: int,
    batch_size: int,
    chunk: int,
) -> Iterator[jnp.ndarray]:
    """Infinite stream of [chunk, batch_size] int32 index blocks drawn from
    epoch permutations — the device-side-gather companion of
    :func:`minibatch_iterator` for the K-steps-per-dispatch training path."""
    batch_size = min(int(batch_size), n)
    seed = int(jax.random.randint(key, (), 0, np.iinfo(np.int32).max))
    rng = np.random.default_rng(seed)
    buf = []
    while True:
        perm = rng.permutation(n)
        limit = (n // batch_size) * batch_size
        for start in range(0, limit, batch_size):
            buf.append(perm[start : start + batch_size])
            if len(buf) == chunk:
                yield jnp.asarray(np.stack(buf), dtype=jnp.int32)
                buf = []
