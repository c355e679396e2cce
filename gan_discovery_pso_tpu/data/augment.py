"""Geometric augmentation for CT slices, on device.

Re-designs the reference's cv2/scipy augmentation chain
(src/utils/util_data.py:156-275: random hflip/vflip, ±10% shift, ±175°
rotation, ±10% zoom, elastic deformation — each applied with prob 0.3) as
batched, jittable jax ops: one gather-based affine resample per image and a
convolution-smoothed displacement field for the elastic branch. The whole
augmenting batch is a single fused device program under vmap, replacing the
reference's per-image host cv2 calls.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugmentConfig(NamedTuple):
    prob: float = 0.3  # reference: applied when randint(0,100) > 70
    shift_perc: float = 0.1
    max_angle: float = 175.0
    zoom_perc: float = 0.1
    zoom: bool = False
    elastic: bool = False
    elastic_alpha: tuple = (20.0, 40.0)
    elastic_sigma: float = 7.0


def _bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """img [H,W]; ys/xs [H,W] float sample coords; zero padding outside."""
    h, w = img.shape
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1, x1 = y0 + 1, x0 + 1
    wy = ys - y0
    wx = xs - x0

    def at(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb, v, 0.0)

    return (
        at(y0, x0) * (1 - wy) * (1 - wx)
        + at(y0, x1) * (1 - wy) * wx
        + at(y1, x0) * wy * (1 - wx)
        + at(y1, x1) * wy * wx
    )


def _affine_grid(h, w, angle, zoom, dy, dx, flip_h, flip_v):
    """Inverse-map sample grid for rotate(angle°)+zoom+shift+flips about the
    image center (cv2's warpAffine convention: positive angle = CCW)."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # undo shift, then rotate/scale backwards around center
    y = yy - dy - cy
    x = xx - dx - cx
    rad = -angle * math.pi / 180.0  # inverse rotation
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    ys = (x * sin + y * cos) / zoom + cy
    xs = (x * cos - y * sin) / zoom + cx
    ys = jnp.where(flip_v, (h - 1) - ys, ys)
    xs = jnp.where(flip_h, (w - 1) - xs, xs)
    return ys, xs


def _smooth(field: jax.Array, sigma: float) -> jax.Array:
    """Separable gaussian blur via two 1-D convolutions (the elastic
    displacement smoothing, reference util_data.py:179-180)."""
    radius = int(3 * sigma)
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (t / sigma) ** 2)
    k = k / jnp.sum(k)
    f = field[None, None]  # [1,1,H,W]
    f = jax.lax.conv_general_dilated(
        f, k[None, None, :, None], (1, 1), [(radius, radius), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    f = jax.lax.conv_general_dilated(
        f, k[None, None, None, :], (1, 1), [(0, 0), (radius, radius)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return f[0, 0]


def augment_image(key: jax.Array, img: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """img [C,H,W] → randomly augmented [C,H,W] (branch probabilities and
    parameter ranges per reference util_data.py:234-275)."""
    c, h, w = img.shape
    ks = jax.random.split(key, 12)
    u = jax.random.uniform(ks[0], (5,))

    flip_h = u[0] < cfg.prob
    flip_v = u[1] < cfg.prob
    do_shift = u[2] < cfg.prob
    do_rot = u[3] < cfg.prob
    do_zoom = jnp.logical_and(u[4] < cfg.prob, cfg.zoom)

    dy = jnp.where(do_shift,
                   jax.random.uniform(ks[1], (), minval=-cfg.shift_perc * h,
                                      maxval=cfg.shift_perc * h), 0.0)
    dx = jnp.where(do_shift,
                   jax.random.uniform(ks[2], (), minval=-cfg.shift_perc * w,
                                      maxval=cfg.shift_perc * w), 0.0)
    angle = jnp.where(do_rot,
                      jax.random.uniform(ks[3], (), minval=-cfg.max_angle,
                                         maxval=cfg.max_angle), 0.0)
    zoom = jnp.where(do_zoom,
                     jax.random.uniform(ks[4], (), minval=1 - cfg.zoom_perc,
                                        maxval=1 + cfg.zoom_perc), 1.0)

    ys, xs = _affine_grid(h, w, angle, zoom, dy, dx, flip_h, flip_v)

    if cfg.elastic:
        do_el = jax.random.uniform(ks[5], ()) < cfg.prob
        alpha = jax.random.uniform(ks[6], (), minval=cfg.elastic_alpha[0],
                                   maxval=cfg.elastic_alpha[1])
        dfy = _smooth(jax.random.uniform(ks[7], (h, w)) * 2 - 1, cfg.elastic_sigma) * alpha
        dfx = _smooth(jax.random.uniform(ks[8], (h, w)) * 2 - 1, cfg.elastic_sigma) * alpha
        ys = jnp.where(do_el, ys + dfy, ys)
        xs = jnp.where(do_el, xs + dfx, xs)

    return jax.vmap(lambda ch: _bilinear_sample(ch, ys, xs))(img)


def augment_batch(key: jax.Array, images: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """[N,C,H,W] batch, one independent random chain per image, fused."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, im: augment_image(k, im, cfg))(keys, images)
