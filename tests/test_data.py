"""Data-layer tests: synthetic fallback, class filtering, drange, batching,
medical box-crop arithmetic."""

import numpy as np

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.data import (
    ClipSpec,
    crop_box,
    epoch_batches,
    load_mnist,
    normalize01,
    preprocess_ct_slice,
    square_box,
    synth_digits,
    train_val_split,
)


def test_synth_digits_deterministic_and_ranged():
    a_img, a_lab = synth_digits(50, seed=0)
    b_img, b_lab = synth_digits(50, seed=0)
    np.testing.assert_array_equal(a_img, b_img)
    np.testing.assert_array_equal(a_lab, b_lab)
    assert a_img.shape == (50, 28, 28)
    assert a_img.min() >= 0.0 and a_img.max() <= 1.0
    assert set(np.unique(a_lab)).issubset(set(range(10)))
    # different classes look different (mean images separated)
    c_img, c_lab = synth_digits(600, seed=2)
    m1 = c_img[c_lab == 1].mean(0)
    m8 = c_img[c_lab == 8].mean(0)
    assert np.abs(m1 - m8).mean() > 0.02


def test_load_mnist_fallback_filters_and_dranges(tmp_path):
    ds = load_mnist(tmp_path, "train", classes=(0, 2, 3), drange=(-1, 1))
    assert ds.source == "synthetic"
    labs = np.unique(np.asarray(ds.labels))
    assert set(labs.tolist()) == {0, 2, 3}
    assert ds.images.shape[1:] == (1, 28, 28)
    assert float(ds.images.min()) >= -1.0 and float(ds.images.max()) <= 1.0
    # drange [0,1]
    ds01 = load_mnist(tmp_path, "test", classes=None, drange=(0, 1))
    assert float(ds01.images.min()) >= 0.0 and float(ds01.images.max()) <= 1.0


def test_epoch_batches_cover_and_shuffle(tmp_path):
    ds = load_mnist(tmp_path, "test", drange=(0, 1))
    batches = list(epoch_batches(ds, 128, jax.random.key(0)))
    n = ds.images.shape[0]
    assert len(batches) == n // 128
    x0, y0 = batches[0]
    assert x0.shape == (128, 1, 28, 28)
    # different key -> different order
    b2 = list(epoch_batches(ds, 128, jax.random.key(1)))
    assert not np.array_equal(np.asarray(batches[0][1]), np.asarray(b2[0][1]))


def test_train_val_split(tmp_path):
    ds = load_mnist(tmp_path, "test", drange=(0, 1))
    tr, va = train_val_split(ds, 0.25)
    assert tr.images.shape[0] + va.images.shape[0] == ds.images.shape[0]
    assert va.images.shape[0] == int(ds.images.shape[0] * 0.25)


def test_square_box_makes_square():
    # tall box: h=10, w=4 -> width grows by ceil(3)=3 before, floor(3)=3 after
    y0, x0, y1, x1 = square_box([5, 10, 15, 14])
    assert (y1 - y0) == (x1 - x0) == 10
    # wide box
    y0, x0, y1, x1 = square_box([5, 10, 9, 30])
    assert (y1 - y0) == (x1 - x0) == 20
    # border expansion keeps squareness
    y0, x0, y1, x1 = square_box([5, 10, 15, 14], perc_border=0.5)
    assert (y1 - y0) == (x1 - x0)


def test_crop_box_pads_out_of_frame():
    img = np.ones((20, 20))
    out = crop_box(img, [0, 0, 10, 4])  # squaring pushes x negative
    assert out.shape[0] == out.shape[1] == 10
    # padded region is zeros
    assert out[:, 0].sum() < out[:, -1].sum() or out.min() == 0.0


def test_preprocess_ct_slice_pipeline():
    rng = np.random.RandomState(0)
    scan = rng.uniform(-2000, 2000, (512, 512))
    out = preprocess_ct_slice(
        scan, 256, box=[100, 150, 300, 280],
        clip=ClipSpec(-1000, 1000), scale=ClipSpec(-1000, 1000),
    )
    assert out.shape == (1, 256, 256)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # without fixed scale: normalized by pre-clip min/max (reference :110,124)
    out2 = preprocess_ct_slice(scan, 64, clip=ClipSpec(-1000, 1000))
    assert out2.shape == (1, 64, 64)
    assert 0.0 <= out2.min() and out2.max() <= 1.0


def test_normalize01_falsy_bounds_fall_back():
    img = np.array([[2.0, 4.0]])
    out = normalize01(img, min_val=0, max_val=None)  # 0 is falsy -> data min
    np.testing.assert_allclose(out, [[0.0, 1.0]])


def _write_idx_images(path, arr, gz=False):
    import gzip, struct

    header = struct.pack(">HBB", 0, 8, arr.ndim) + b"".join(
        __import__("struct").pack(">I", d) for d in arr.shape
    )
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(header + arr.astype(np.uint8).tobytes())


def test_load_mnist_from_idx_files(tmp_path):
    """The real-MNIST path: idx files (plain + gz) under MNIST/raw parse,
    filter, and drange correctly (source == 'mnist-idx')."""
    rng = np.random.RandomState(0)
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    imgs = rng.randint(0, 256, (60, 28, 28)).astype(np.uint8)
    labs = rng.randint(0, 10, 60).astype(np.uint8)
    _write_idx_images(raw / "train-images-idx3-ubyte", imgs)
    _write_idx_images(raw / "train-labels-idx1-ubyte", labs)
    # test split as gz
    _write_idx_images(raw / "t10k-images-idx3-ubyte.gz", imgs[:20], gz=True)
    _write_idx_images(raw / "t10k-labels-idx1-ubyte.gz", labs[:20], gz=True)

    ds = load_mnist(tmp_path, "train", classes=(0, 2, 3), drange=(-1, 1))
    assert ds.source == "mnist-idx"
    mask = np.isin(labs, [0, 2, 3])
    assert ds.images.shape[0] == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(ds.labels), labs[mask])
    # pixel values faithfully mapped: uint8/255 * 2 - 1
    want = imgs[mask][0].astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(np.asarray(ds.images[0, 0]), want, atol=1e-6)

    ds_gz = load_mnist(tmp_path, "test", drange=(0, 1))
    assert ds_gz.source == "mnist-idx"
    assert ds_gz.images.shape[0] == 20
