"""Device-resident sequence tracking: the example3 loop with ZERO
per-frame host synchronization.

Reference parity: example3.py / SURVEY.md section 3.5 — the same
select -> (track -> replace-lost)* recurrence as models.sequence, but
with the whole per-frame body (pyramid build, batched pyramidal LK, and
on-device replace-lost from ops.select_device) fused into one jitted
program whose state (pyramids + feature arrays) never leaves the TPU.
This is the BASELINE config-2 serving path: on relay-backed rigs a
single device->host pull per frame would collapse dispatch (DESIGN.md
rule 3), so the host loop only *issues* steps and pulls the stacked
track table once at the end.

Replacement is lax.cond-gated on "any feature lost", so frames where
every feature tracks pay zero selection cost.
"""

from __future__ import annotations

import functools
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import TrackerConfig, create_config
from ..features import KLT_NOT_FOUND
from ..ops.select import quantized_min_eig_map, selection_eig_map_core
from ..ops.select_device import (DEFAULT_TOP_K,
                                 select_features_from_eig_device)
from ..ops.track import (TrackPyramids, build_track_pyramids,
                         track_features_pyramids)


def _selection_eig_from_pyr(img: jax.Array, pyr: TrackPyramids, cfg
                            ) -> jax.Array:
    """Min-eig map for selection, reusing the tracking pyramid's level-0
    gradients when the configs coincide (smoothBeforeSelecting=True means
    selection smooths with smooth_sigma exactly like the pyramid base)."""
    if cfg.smoothBeforeSelecting:
        return quantized_min_eig_map(pyr.gradx[0], pyr.grady[0],
                                     int(cfg.window_width),
                                     int(cfg.window_height))
    return selection_eig_map_core(
        img, window_width=int(cfg.window_width),
        window_height=int(cfg.window_height), smooth_before=False,
        smooth_sigma=float(cfg.smooth_sigma),
        grad_sigma=float(cfg.grad_sigma))


@functools.partial(jax.jit, static_argnames=("cfg", "n_features", "top_k"))
def select_step_device(img: jax.Array, cfg, n_features: int,
                       top_k: int = DEFAULT_TOP_K):
    """Frame-0 step: build pyramids + select n_features on device."""
    img = jnp.asarray(img, jnp.float32)
    pyr = build_track_pyramids(img, cfg)
    eig = _selection_eig_from_pyr(img, pyr, cfg)
    x0 = jnp.full((n_features,), -1.0, jnp.float32)
    y0 = jnp.full((n_features,), -1.0, jnp.float32)
    v0 = jnp.full((n_features,), KLT_NOT_FOUND, jnp.int32)
    x, y, val, _, _ = select_features_from_eig_device(
        eig, x0, y0, v0, cfg, replacing=False, top_k=top_k)
    return pyr, x, y, val


@functools.partial(jax.jit, static_argnames=("cfg", "replace_lost",
                                             "top_k"))
def sequence_step_device(pyr_prev: TrackPyramids, img_new: jax.Array,
                         x: jax.Array, y: jax.Array, val: jax.Array,
                         cfg, replace_lost: bool = True,
                         top_k: int = DEFAULT_TOP_K):
    """One frame step: track into img_new, then (conditionally) refill
    lost slots — all device-side. Returns (pyr_new, x, y, val)."""
    img_new = jnp.asarray(img_new, jnp.float32)
    pyr_new = build_track_pyramids(img_new, cfg)
    x, y, val = track_features_pyramids(pyr_prev, pyr_new, x, y, val, cfg)

    if replace_lost:
        def refill(op):
            xx, yy, vv = op
            eig = _selection_eig_from_pyr(img_new, pyr_new, cfg)
            nx, ny, nv, _, _ = select_features_from_eig_device(
                eig, xx, yy, vv, cfg, replacing=True, top_k=top_k)
            return nx, ny, nv

        x, y, val = lax.cond(jnp.any(val < 0), refill, lambda op: op,
                             (x, y, val))
    return pyr_new, x, y, val


def track_sequence_device(frames: Iterable, cfg: Optional[TrackerConfig]
                          = None, n_features: int = 150,
                          replace_lost: bool = True,
                          top_k: int = DEFAULT_TOP_K):
    """Track a whole sequence device-resident; one host pull at the end.

    Returns (x, y, val) stacked [n_frames, n_features] numpy arrays —
    the FeatureTable contents of models.sequence.track_sequence.
    """
    cfg = (cfg if cfg is not None else create_config()).replace(
        sequentialMode=True).validated_window()
    if cfg.affineConsistencyCheck >= 0:
        raise NotImplementedError(
            "device-resident sequence loop is translational-only; use "
            "models.sequence.track_sequence for affine consistency")
    frames = list(frames)
    dev_frames = [jnp.asarray(np.asarray(f), jnp.float32) for f in frames]

    pyr, x, y, val = select_step_device(dev_frames[0], cfg, n_features,
                                        top_k)
    xs, ys, vs = [x], [y], [val]
    for img in dev_frames[1:]:
        pyr, x, y, val = sequence_step_device(pyr, img, x, y, val, cfg,
                                              replace_lost, top_k)
        xs.append(x)
        ys.append(y)
        vs.append(val)
    jax.block_until_ready(val)
    return (np.asarray(jnp.stack(xs)), np.asarray(jnp.stack(ys)),
            np.asarray(jnp.stack(vs)))
