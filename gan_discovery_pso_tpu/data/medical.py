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


def load_slice_image(path: str | Path) -> np.ndarray:
    """Extension-dispatched slice loader (reference util_data.py:145-154):
    `.mat` via scipy.io (the array lives under the 'img' key), anything PIL
    can open (`.png`, `.tif`, ...) as float32."""
    path = Path(path)
    if path.suffix == ".mat":
        import scipy.io as sio

        return np.asarray(sio.loadmat(path)["img"], np.float32)
    from PIL import Image

    return np.asarray(Image.open(path), np.float32)


def slice_loader(
    path: str | Path,
    img_dim: int,
    rescale_minus_1_plus_1: bool = False,
    fill_nan: float = -1000.0,
) -> np.ndarray:
    """The sliding-window datasets' per-slice chain (reference
    util_data.py:277-309): load (.mat/.png) → NaN fill → resize(img_dim) →
    per-image min-max rescale to [0,1] → optional [-1,1]. Returns [1,H,W]
    f32. Train-time geometric augmentation is NOT applied here — it runs
    batched on device via data/augment.py (the TPU-native replacement for
    the reference's per-item cv2 host augmentation, :235-276)."""
    img = load_slice_image(path)
    if np.isnan(img).any():
        img = np.where(np.isnan(img), np.float32(fill_nan), img)
    if img.shape[0] != img_dim or img.shape[1] != img_dim:
        # host-side bilinear resize (like the reference's cv2.resize,
        # util_data.py:291): one device dispatch PER SLICE here would pay the
        # TPU-tunnel RTT thousands of times while materializing a manifest —
        # the device is for the batched training path, not item-wise IO
        from PIL import Image

        img = np.asarray(
            Image.fromarray(np.ascontiguousarray(img, np.float32), mode="F")
            .resize((img_dim, img_dim), Image.BILINEAR),
            np.float32,
        )
    img = normalize01(img.astype(np.float64)).astype(np.float32)
    if rescale_minus_1_plus_1:
        img = ((img - 0.5) * 2.0).astype(np.float32)
    return img[None, :, :]


class SlidingWindowDataset(NamedTuple):
    """HBM-friendly materialization of the reference's sliding-window CT
    datasets (DatasetSlidingWindowClaro/Aerts, util_data.py:358-420): the
    whole manifest is loaded into one [N,1,H,W] stack up front (slices are
    small) so epochs are jitted gathers, matching data/mnist.py's design —
    not a per-item host Dataset."""

    images: np.ndarray  # [N, 1, H, W] float32
    labels: np.ndarray  # [N] int32
    patient_ids: tuple  # [N] str patient id
    slice_ids: tuple  # [N] str/int slice id


def _sliding_window_dir(data_dir, cfg_data, flavor: str) -> Path:
    """The two reference classes differ ONLY in the image-directory layout
    (util_general.create_path): claro adds the nan_cutoff path segment
    (util_data.py:363), aerts does not (:395)."""
    base = Path(data_dir) / str(cfg_data["channel"]) / str(cfg_data["image_size"])
    if flavor == "claro":
        return base / str(cfg_data["nan_cutoff"])
    if flavor == "aerts":
        return base
    raise ValueError(f"unknown sliding-window flavor {flavor!r}")


def load_sliding_window_dataset(
    manifest: dict[str, list],
    data_dir: str | Path,
    cfg_data,
    flavor: str = "claro",
    step: str = "train",
    extension: str = ".mat",
) -> SlidingWindowDataset:
    """manifest: {'id': [...], 'id_slice': [...], 'label': [...]} (the
    reference's DataFrame rows, util_data.py:377-385,409-417). Each slice is
    `{id}_{id_slice}{extension}` under the flavor's directory layout and
    runs through `slice_loader`. `step` is accepted for API parity; the
    train-time augmentation itself is device-side (see slice_loader)."""
    img_dir = _sliding_window_dir(data_dir, cfg_data, flavor)
    img_dim = int(cfg_data["image_size"])
    rescale_pm1 = bool(cfg_data.get("rescale_minus_1_plus_1", False))
    imgs, labels, pids, sids = [], [], [], []
    def norm_id(v):
        # xlsx numeric cells arrive as float (12.0); the filenames use the
        # integer spelling — normalize BOTH id columns the same way
        return str(int(v)) if isinstance(v, float) and v == int(v) else str(v)

    for i, (pid, sid, lab) in enumerate(
        zip(manifest["id"], manifest["id_slice"], manifest["label"])
    ):
        if pid is None or sid is None or lab is None:
            raise ValueError(
                f"manifest row {i}: empty cell (id={pid!r}, id_slice={sid!r}, "
                f"label={lab!r}) — every row needs id, id_slice and label"
            )
        pid_s, sid_s = norm_id(pid), norm_id(sid)
        path = img_dir / f"{pid_s}_{sid_s}{extension}"
        imgs.append(slice_loader(path, img_dim, rescale_minus_1_plus_1=rescale_pm1))
        labels.append(int(float(lab)))
        pids.append(pid_s)
        sids.append(sid_s)
    return SlidingWindowDataset(
        images=np.stack(imgs, axis=0),
        labels=np.asarray(labels, np.int32),
        patient_ids=tuple(pids),
        slice_ids=tuple(sids),
    )


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
            # float32 TIFF like the reference export
            # (dataset_preparation.py:95-103: Image.fromarray on the raw
            # normalized float array)
            Image.fromarray(x[0].astype(np.float32), mode="F").save(
                od / f"{sid}.tif", format="TIFF"
            )
    return np.stack(out, axis=0), meta


def read_box_manifest(path: str | Path, box_value: str = "box") -> dict:
    """Box manifest → {img_id: [y0, x0, y1, x1]} (reference
    ImgDatasetPreparation, util_medical_data.py:137-141: indexed by
    'img ID', the box column holds a stringified list that the reference
    eval()s — parsed here with ast.literal_eval)."""
    import ast

    from gan_discovery_pso_tpu.data.xlsx import read_manifest

    cols = read_manifest(path)
    ids = cols["img ID"]
    boxes = cols[box_value]
    out = {}
    for img_id, box in zip(ids, boxes):
        if img_id is None or box is None:
            continue
        key = str(Path(str(img_id)).name)
        out[key] = list(ast.literal_eval(str(box)))
    return out


def read_patients_info(path: str | Path) -> list[str]:
    """patients_info_{dataset} manifest → ['{patient}_{slice}', ...]
    (reference dataset_preparation.py:81-83: the 'image' column holds
    'subdir/{patient}_{slice}.tif' paths)."""
    from gan_discovery_pso_tpu.data.xlsx import read_manifest

    cols = read_manifest(path)
    out = []
    for row in cols["image"]:
        if row is None:
            continue
        name = str(row).replace("\\", "/").split("/")[-1]
        out.append(name.split(".tif")[0])
    return out
