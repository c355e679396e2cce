"""MNIST pipeline as device-resident arrays.

MNIST fits in HBM (60k × 28×28 fp32 ≈ 188 MB), so the entire dataset is
normalized once and uploaded; an "epoch" is a jitted gather over a permuted
index array — no DataLoader, no host round-trips (SURVEY.md §7 layer 2).
This replaces the reference's torchvision pipeline + per-batch transforms
(reference src/utils/util_data.py:73-114) and `split_MNIST` class filtering
(src/utils/util_mnist.py:19-34).

Sources, in order:
1. idx files under  <data_dir>/MNIST/raw/  (the torchvision layout:
   train-images-idx3-ubyte[.gz] etc.) — parsed natively (no torchvision);
2. a deterministic synthetic fallback (data/synthetic_digits.py) so every
   pipeline stage runs end-to-end in network-less environments; the
   fallback is clearly flagged in the returned metadata.
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path
from typing import Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ImageDataset(NamedTuple):
    images: jax.Array  # [N, 1, H, W] float32, in drange
    labels: jax.Array  # [N] int32
    drange: tuple
    source: str  # "mnist-idx" | "synthetic"


_FILES = {
    "train": ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
    "test": ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"),
}


def _read_idx(path: Path) -> np.ndarray:
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as f:
        magic, = struct.unpack(">I", f.read(4))
        ndim = magic & 0xFF
        dims = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(dims)


def _find_idx(data_dir: Path, stem: str) -> Path | None:
    for root in (data_dir / "MNIST" / "raw", data_dir):
        for suffix in ("", ".gz"):
            p = root / (stem + suffix)
            if p.exists():
                return p
    return None


def load_mnist(
    data_dir: str | Path,
    split: str = "train",
    classes=None,
    drange=(-1, 1),
    image_size: int = 28,
) -> ImageDataset:
    """Load (or synthesize) MNIST, filter to `classes`, map to `drange`."""
    data_dir = Path(data_dir)
    img_stem, lab_stem = _FILES[split]
    img_path, lab_path = _find_idx(data_dir, img_stem), _find_idx(data_dir, lab_stem)

    if img_path is not None and lab_path is not None:
        images = _read_idx(img_path).astype(np.float32) / 255.0  # [N,28,28] in [0,1]
        labels = _read_idx(lab_path).astype(np.int32)
        source = "mnist-idx"
    else:
        from gan_discovery_pso_tpu.data.synthetic_digits import synth_digits

        n = 16000 if split == "train" else 4000
        images, labels = synth_digits(n, seed=0 if split == "train" else 1)
        source = "synthetic"

    if classes is not None:
        mask = np.isin(labels, np.asarray(list(classes)))
        images, labels = images[mask], labels[mask]

    if image_size != images.shape[-1]:
        import jax.image

        # jax.image.resize antialiases on downsampling (its default); PIL's
        # transforms.Resize (the reference path, util_data.py:41) uses a
        # slightly different filter, so non-native image_size runs are
        # numerically close to but not bitwise the reference's pixels — the
        # only reference config is the native 28 (dcgan_mnist.yaml:11)
        images = np.asarray(
            jax.image.resize(
                jnp.asarray(images), (images.shape[0], image_size, image_size), "bilinear"
            )
        )

    from gan_discovery_pso_tpu.ops.rescale import adjust_dynamic_range

    images = np.asarray(adjust_dynamic_range(images, (0, 1), drange))
    return ImageDataset(
        images=jnp.asarray(images[:, None, :, :], jnp.float32),
        labels=jnp.asarray(labels, jnp.int32),
        drange=tuple(drange),
        source=source,
    )


def epoch_batches(
    ds: ImageDataset, batch_size: int, key: jax.Array, drop_last: bool = True
) -> Iterator[tuple[jax.Array, jax.Array]]:
    """Shuffled epoch as jitted gathers on the device-resident arrays."""
    n = ds.images.shape[0]
    perm = jax.random.permutation(key, n)
    n_batches = n // batch_size if drop_last else -(-n // batch_size)
    for b in range(n_batches):
        idx = perm[b * batch_size : (b + 1) * batch_size]
        yield jnp.take(ds.images, idx, axis=0), jnp.take(ds.labels, idx, axis=0)


def train_val_split(ds: ImageDataset, val_fraction: float = 0.2) -> tuple[ImageDataset, ImageDataset]:
    n = ds.images.shape[0]
    cut = n - int(n * val_fraction)
    return (
        ImageDataset(ds.images[:cut], ds.labels[:cut], ds.drange, ds.source),
        ImageDataset(ds.images[cut:], ds.labels[cut:], ds.drange, ds.source),
    )
