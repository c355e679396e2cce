"""CLARO CT preprocessing: square box-crop, clip, normalize, resize, export.

Re-implements the reference medical path
(reference src/utils/util_medical_data.py:23-129 and the export driver
src/data/dataset_preparation.py:90-103) with a clean formulation of the
box-squaring rule: expand the short side symmetrically (ceil on the leading
edge, floor on the trailing edge) plus a `perc_border` margin of
ceil(Δ/2)·perc on every edge, zero-padding the scan where the expanded box
leaves the frame. Host-side numpy for the irregular crop/pad, device-side
resize/normalize.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import NamedTuple

import numpy as np


class ClipSpec(NamedTuple):
    min: float
    max: float


def square_box(box, perc_border: float = 0.0):
    """[y0, x0, y1, x1] → squared (y0, x0, y1, x1) with border margin.

    Matches reference get_box arithmetic (util_medical_data.py:23-94): the
    short side grows by ceil(Δ/2) before / floor(Δ/2) after; every edge then
    grows by border = int(perc_border · ceil(Δ/2))."""
    y0, x0, y1, x1 = (int(v) for v in box)
    l_h, l_w = y1 - y0, x1 - x0
    d1 = math.ceil(abs(l_h - l_w) / 2)
    d2 = math.floor(abs(l_h - l_w) / 2)
    border = int(perc_border * d1)
    if l_h > l_w:
        x0, x1 = x0 - d1, x1 + d2
    elif l_w > l_h:
        y0, y1 = y0 - d1, y1 + d2
    return y0 - border, x0 - border, y1 + border, x1 + border


def crop_box(img: np.ndarray, box, perc_border: float = 0.0) -> np.ndarray:
    """Crop the squared box, zero-padding out-of-frame regions
    (reference get_box's vstack/hstack padding)."""
    y0, x0, y1, x1 = square_box(box, perc_border)
    h, w = img.shape[:2]
    pad_top, pad_left = max(0, -y0), max(0, -x0)
    pad_bot, pad_right = max(0, y1 - h), max(0, x1 - w)
    if pad_top or pad_left or pad_bot or pad_right:
        img = np.pad(img, ((pad_top, pad_bot), (pad_left, pad_right)), mode="constant")
        y0, x0, y1, x1 = y0 + pad_top, x0 + pad_left, y1 + pad_top, x1 + pad_left
    return img[y0:y1, x0:x1]


def normalize01(img: np.ndarray, min_val=None, max_val=None) -> np.ndarray:
    """(img−min)/(max−min) with optional fixed scale (reference
    util_medical_data.py:97-105; falsy custom bounds fall back to data
    min/max, same as the reference's `if not min_val`)."""
    if not min_val:
        min_val = img.min()
    if not max_val:
        max_val = img.max()
    return (img - min_val) / (max_val - min_val)


def preprocess_ct_slice(
    img: np.ndarray,
    img_dim: int,
    box=None,
    clip: ClipSpec | None = None,
    scale: ClipSpec | None = None,
    perc_border: float = 0.5,
) -> np.ndarray:
    """Full slice pipeline (reference loader, util_medical_data.py:107-129):
    box-crop → resize(img_dim) → clip → normalize. Returns [1, H, W] f32.

    NB the reference records the PRE-clip min/max and normalizes with those
    when no fixed scale is given (:110,124) — kept."""
    img = np.asarray(img, np.float64)
    pre_min, pre_max = img.min(), img.max()
    if box is not None:
        img = crop_box(img, list(box), perc_border=perc_border)

    import jax
    import jax.numpy as jnp

    img = np.asarray(
        jax.image.resize(jnp.asarray(img, jnp.float32), (img_dim, img_dim), "linear")
    )
    if clip is not None:
        img = np.clip(img, clip.min, clip.max)
    if scale is not None:
        img = normalize01(img, scale.min, scale.max)
    else:
        img = normalize01(img, pre_min, pre_max)
    return img[None, :, :].astype(np.float32)


def load_tiff(path: str | Path) -> np.ndarray:
    from PIL import Image

    return np.array(Image.open(path)).astype(np.float64)


def prepare_patient_dataset(
    data_dir: str | Path,
    dataset: str,
    slice_ids: list[str],
    image_size: int,
    boxes: dict | None = None,
    clip: ClipSpec | None = None,
    scale: ClipSpec | None = None,
    out_dir: str | Path | None = None,
):
    """Per-patient TIFF sweep → preprocessed stack [N,1,H,W] (+ optional TIFF
    export for downstream GAN training, reference
    src/data/dataset_preparation.py:90-103). slice_ids are
    '{patient}_{img}' strings (reference ImgDatasetPreparation,
    util_medical_data.py:131-170)."""
    from PIL import Image

    data_dir = Path(data_dir) / dataset
    out = []
    meta = []
    for sid in slice_ids:
        patient_id, img_id = sid.split("_", 1)
        path = data_dir / patient_id / "images" / f"{sid}.tif"
        img = load_tiff(path)
        box = boxes.get(sid) if boxes else None
        x = preprocess_ct_slice(img, image_size, box=box, clip=clip, scale=scale)
        out.append(x)
        meta.append((patient_id, img_id))
        if out_dir is not None:
            od = Path(out_dir)
            od.mkdir(parents=True, exist_ok=True)
            Image.fromarray((x[0] * 255).astype(np.uint8)).save(od / f"{sid}.tif")
    return np.stack(out, axis=0), meta
