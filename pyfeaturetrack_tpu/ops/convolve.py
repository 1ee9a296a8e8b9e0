"""Separable convolution, smoothing, and gradients.

Reference parity: convolve.py -> _convolveImageHoriz / _convolveImageVert /
_convolveSeparate / _KLTComputeSmoothedImage / _KLTComputeGradients.

Semantics reproduced exactly:

* true convolution (kernel flipped relative to cross-correlation);
* output border of ``kernel_width // 2`` pixels is ZEROED on each side along
  the convolved axis (the reference writes 0.0 there instead of padding);
* separable order is horizontal first, then vertical;
* gradx = conv(img, deriv_x (x) gauss_y), grady = conv(img, gauss_x (x) deriv_y).

TPU notes: images are float32; convs go through ``lax.conv_general_dilated``
with ``precision=HIGHEST`` so XLA keeps full fp32 on the MXU and fuses the
border masking. Shapes are static under jit (kernel widths are trace-time
constants from ops/kernels.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .kernels import compute_kernels

_PRECISION = lax.Precision.HIGHEST


def _conv1d(img: jax.Array, kernel: np.ndarray, axis: int) -> jax.Array:
    """Convolve the last-two-dims image along ``axis`` (0=rows/vert, 1=cols/horiz)
    with zeroed borders, matching the reference's border semantics."""
    k = np.asarray(kernel, dtype=np.float32)
    radius = k.shape[0] // 2
    *batch, h, w = img.shape
    x = img.reshape((-1, 1, h, w))

    if axis == 1:  # horizontal
        rhs = jnp.asarray(k[::-1].reshape(1, 1, 1, -1))
        window_strides = (1, 1)
        pad = ((0, 0), (0, 0))
    else:  # vertical
        rhs = jnp.asarray(k[::-1].reshape(1, 1, -1, 1))
        window_strides = (1, 1)
        pad = ((0, 0), (0, 0))

    valid = lax.conv_general_dilated(
        x, rhs, window_strides, pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=_PRECISION,
    )
    if axis == 1:
        out = jnp.pad(valid, ((0, 0), (0, 0), (0, 0), (radius, radius)))
    else:
        out = jnp.pad(valid, ((0, 0), (0, 0), (radius, radius), (0, 0)))
    return out.reshape(img.shape)


def convolve_horiz(img: jax.Array, kernel: np.ndarray) -> jax.Array:
    """Reference parity: convolve.py -> _convolveImageHoriz."""
    return _conv1d(img, kernel, axis=1)


def convolve_vert(img: jax.Array, kernel: np.ndarray) -> jax.Array:
    """Reference parity: convolve.py -> _convolveImageVert."""
    return _conv1d(img, kernel, axis=0)


def convolve_separate(img: jax.Array, horiz_kernel: np.ndarray,
                      vert_kernel: np.ndarray) -> jax.Array:
    """Horizontal pass then vertical pass.

    Reference parity: convolve.py -> _convolveSeparate.
    """
    return convolve_vert(convolve_horiz(img, horiz_kernel), vert_kernel)


def compute_smoothed_image(img: jax.Array, sigma: float) -> jax.Array:
    """Gaussian smoothing with the trimmed kernel for ``sigma``.

    Reference parity: convolve.py -> _KLTComputeSmoothedImage.
    """
    gauss, _ = compute_kernels(float(sigma))
    return convolve_separate(img, gauss, gauss)


def compute_gradients(img: jax.Array, sigma: float) -> tuple[jax.Array, jax.Array]:
    """Derivative-of-Gaussian gradient pair (gradx, grady).

    Reference parity: convolve.py -> _KLTComputeGradients.
    """
    gauss, deriv = compute_kernels(float(sigma))
    gradx = convolve_separate(img, deriv, gauss)
    grady = convolve_separate(img, gauss, deriv)
    return gradx, grady


def to_float_image(img) -> jax.Array:
    """uint8/any image -> float32 image (values preserved, 0..255 scale).

    Reference parity: klt_util.py -> _KLTToFloatImage.
    """
    return jnp.asarray(img, dtype=jnp.float32)
