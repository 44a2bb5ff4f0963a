"""Streaming filters.

MovingWindowFilter: O(1) moving average with Neumaier-compensated summation,
capability-equivalent of the reference's filter (reference:
src/utils/filter.hpp:15-75). Provided both as a host-side class (for the
sensor preprocessing path) and as a vectorized JAX scan for batched offline
filtering.
"""

from __future__ import annotations

import numpy as np


class MovingWindowFilter:
    """O(1) moving average over a fixed window with compensated summation."""

    def __init__(self, window_size: int, dim: int = 1):
        assert window_size > 0
        self.window = window_size
        self.buf = np.zeros((window_size, dim))
        self.idx = 0
        self.count = 0
        self.sum = np.zeros(dim)
        self.correction = np.zeros(dim)

    def _neumaier_add(self, value):
        new_sum = self.sum + value
        big = np.abs(self.sum) >= np.abs(value)
        self.correction = self.correction + np.where(
            big, (self.sum - new_sum) + value, (value - new_sum) + self.sum)
        self.sum = new_sum

    def update(self, value) -> np.ndarray:
        value = np.atleast_1d(np.asarray(value, float))
        if self.count == self.window:
            self._neumaier_add(-self.buf[self.idx])
        else:
            self.count += 1
        self.buf[self.idx] = value
        self.idx = (self.idx + 1) % self.window
        self._neumaier_add(value)
        return (self.sum + self.correction) / self.count

    @property
    def average(self) -> np.ndarray:
        return (self.sum + self.correction) / max(self.count, 1)


def moving_average_batch(x, window: int):
    """Batched causal moving average along axis 0 (JAX).

    x: (T, ...) -> (T, ...); mean over the trailing `window` samples
    (fewer at the start)."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    c = jnp.cumsum(x, axis=0)
    shifted = jnp.concatenate([jnp.zeros_like(c[:window]),
                               c[:-window]], axis=0)
    n = jnp.minimum(jnp.arange(1, x.shape[0] + 1), window)
    n = n.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    return (c - shifted) / n
