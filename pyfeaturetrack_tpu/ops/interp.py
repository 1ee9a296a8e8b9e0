"""Batched bilinear window sampling.

Reference parity: trackFeatures.py -> _interpolate. The reference samples
one pixel at a time with a 4-tap bilinear read; here a whole (features x
window) block of samples is gathered at once — the shape the TPU wants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear(img: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    """Sample ``img[y, x]`` bilinearly at float coords (any broadcastable
    shape). Indices are clamped for memory safety; callers mask validity
    separately (the reference guarantees in-bounds reads via its bounds
    checks, so clamping never changes an *active* lane's value).
    """
    h, w = img.shape[-2], img.shape[-1]
    xt = jnp.floor(xs).astype(jnp.int32)
    yt = jnp.floor(ys).astype(jnp.int32)
    ax = xs - xt
    ay = ys - yt
    x0 = jnp.clip(xt, 0, w - 2)
    y0 = jnp.clip(yt, 0, h - 2)
    p00 = img[y0, x0]
    p01 = img[y0, x0 + 1]
    p10 = img[y0 + 1, x0]
    p11 = img[y0 + 1, x0 + 1]
    return ((1.0 - ax) * (1.0 - ay) * p00 + ax * (1.0 - ay) * p01 +
            (1.0 - ax) * ay * p10 + ax * ay * p11)


def window_coords(x: jax.Array, y: jax.Array, hw: int, hh: int
                  ) -> tuple[jax.Array, jax.Array]:
    """Per-feature window sample coordinates.

    ``x, y``: [N] centers. Returns (xs, ys) of shape [N, 2*hh+1, 2*hw+1]
    with xs[n, j, i] = x[n] + (i - hw), ys[n, j, i] = y[n] + (j - hh) —
    the reference's window iteration order (j outer, i inner).
    """
    offs_x = jnp.arange(-hw, hw + 1, dtype=x.dtype)
    offs_y = jnp.arange(-hh, hh + 1, dtype=y.dtype)
    xs = x[:, None, None] + offs_x[None, None, :]
    ys = y[:, None, None] + offs_y[None, :, None]
    xs, ys = jnp.broadcast_arrays(xs, ys)
    return xs, ys


def gather_window(img: jax.Array, x: jax.Array, y: jax.Array,
                  hw: int, hh: int) -> jax.Array:
    """Bilinear window stack [N, h, w] centered at per-feature (x, y)."""
    xs, ys = window_coords(x, y, hw, hh)
    return bilinear(img, xs, ys)
