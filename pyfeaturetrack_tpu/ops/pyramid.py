"""Image pyramid: per level, smooth then decimate with half-stride offset.

Reference parity: pyramid.py -> _KLTComputePyramid (and the pyramid
container class).

Semantics reproduced exactly:

* level 0 is the input image itself;
* for each coarser level: smooth the previous level with
  ``sigma = subsampling * sigma_fact`` then take samples at
  ``(subsampling*y + subsampling//2, subsampling*x + subsampling//2)``;
* level dims are ``prev // subsampling`` (floor).

The pyramid is a tuple of arrays (a pytree), one per level — shapes are
static per level so the whole build jits into a handful of fused convs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from .convolve import compute_gradients, compute_smoothed_image


class Pyramid(NamedTuple):
    """Multi-level image pyramid. ``levels[0]`` is full resolution."""
    levels: tuple[jax.Array, ...]
    subsampling: int

    @property
    def nLevels(self) -> int:
        return len(self.levels)


def compute_pyramid(img: jax.Array, subsampling: int, nlevels: int,
                    sigma_fact: float) -> Pyramid:
    """Build an ``nlevels``-deep pyramid of ``img``.

    Reference parity: pyramid.py -> _KLTComputePyramid.
    """
    subhalf = subsampling // 2
    sigma = subsampling * sigma_fact
    levels = [img]
    cur = img
    for _ in range(1, nlevels):
        smoothed = compute_smoothed_image(cur, sigma)
        cur = smoothed[subhalf::subsampling, subhalf::subsampling]
        h, w = levels[-1].shape[-2] // subsampling, levels[-1].shape[-1] // subsampling
        cur = cur[:h, :w]
        levels.append(cur)
    return Pyramid(levels=tuple(levels), subsampling=subsampling)


def compute_gradient_pyramids(pyr: Pyramid, grad_sigma: float
                              ) -> tuple[Pyramid, Pyramid]:
    """Per-level derivative-of-Gaussian gradients (gradx, grady) pyramids.

    Reference parity: trackFeatures.py -> KLTTrackFeatures pyramid-build
    phase (per-level _KLTComputeGradients calls).
    """
    gxs, gys = [], []
    for level in pyr.levels:
        gx, gy = compute_gradients(level, grad_sigma)
        gxs.append(gx)
        gys.append(gy)
    return (Pyramid(tuple(gxs), pyr.subsampling),
            Pyramid(tuple(gys), pyr.subsampling))
