"""CLARO preprocessing stage end-to-end with generated patient TIFFs."""

import numpy as np
from PIL import Image

from gan_discovery_pso_tpu.core import load_config
from gan_discovery_pso_tpu.pipelines import StageContext
from gan_discovery_pso_tpu.pipelines.analysis_stages import run_claro_preprocess


def test_claro_preprocess_stage(tmp_path):
    # synthetic 2-patient CT layout: data_raw/<dataset>/<patient>/images/*.tif
    dataset = "claro_prospettivo"
    rng = np.random.RandomState(0)
    slice_ids, boxes = [], {}
    for pid in ("PAT1", "PAT2"):
        d = tmp_path / "raw" / dataset / pid / "images"
        d.mkdir(parents=True)
        for s in range(2):
            sid = f"{pid}_{s}"
            scan = rng.uniform(-1500, 1500, (128, 128)).astype(np.float32)
            Image.fromarray(scan).save(d / f"{sid}.tif")
            slice_ids.append(sid)
            boxes[sid] = [30, 40, 90, 80]

    cfg = load_config("configs/claro_preprocess.yaml", overrides={
        "data.data_dir": str(tmp_path / "raw"),
        "data.interim_dir": str(tmp_path / "interim"),
        "data.model_dir": str(tmp_path / "models"),
        "data.reports_dir": str(tmp_path / "reports"),
        "data.image_size": 64,
    })
    ctx = StageContext.create(cfg, "claro_preprocess")
    stack, meta = run_claro_preprocess(ctx, slice_ids=slice_ids, boxes=boxes)

    assert stack.shape == (4, 1, 64, 64)
    assert stack.min() >= 0.0 and stack.max() <= 1.0
    assert meta[0] == ("PAT1", "0")
    assert (ctx.run.interim_dir / "claro_preprocessed.npz").exists()
    # reference export layout: interim/.../stylegan/{id}.tif, float32
    # (dataset_preparation.py:70-71,95-103)
    exported = sorted((ctx.run.interim_dir / "stylegan").glob("*.tif"))
    assert len(exported) == 4
    reread = np.asarray(Image.open(exported[0]))
    assert reread.dtype == np.float32
    np.testing.assert_allclose(reread, stack[0, 0], atol=1e-6)
    # the claro yaml's string class fields parse as 1-tuples
    assert ctx.data_cfg.iid_classes == ("claro_retrospettivo",)


def _write_patient_tiffs(tmp_path, dataset, patients=("PAT1", "PAT2"), n_slices=2):
    rng = np.random.RandomState(1)
    slice_ids = []
    for pid in patients:
        d = tmp_path / "raw" / dataset / pid / "images"
        d.mkdir(parents=True, exist_ok=True)
        for s in range(n_slices):
            sid = f"{pid}_{s}"
            scan = rng.uniform(-1500, 1500, (96, 96)).astype(np.float32)
            Image.fromarray(scan).save(d / f"{sid}.tif")
            slice_ids.append(sid)
    return slice_ids


def test_claro_preprocess_from_xlsx_manifests(tmp_path):
    """End-to-end manifest discovery (reference dataset_preparation.py:78-90):
    patients_info xlsx 'image' column ∩ box xlsx 'img ID' → slice set."""
    from gan_discovery_pso_tpu.data.xlsx import write_xlsx

    dataset = "claro_prospettivo"
    slice_ids = _write_patient_tiffs(tmp_path, dataset)

    interim_ds = tmp_path / "interim" / dataset
    interim_ds.mkdir(parents=True)
    # patients_info lists ALL slices; box manifest covers only 3 of 4 → the
    # intersection drops the boxless one
    write_xlsx(interim_ds / f"patients_info_{dataset}.xlsx",
               {"image": [f"imgs/{sid}.tif" for sid in slice_ids]})
    boxed = slice_ids[:3]
    write_xlsx(tmp_path / "boxes.xlsx", {
        "img ID": boxed,
        "max_box": ["[20, 25, 70, 60]"] * len(boxed),
    })

    cfg = load_config("configs/claro_preprocess.yaml", overrides={
        "data.data_dir": str(tmp_path / "raw"),
        "data.interim_dir": str(tmp_path / "interim"),
        "data.model_dir": str(tmp_path / "models"),
        "data.reports_dir": str(tmp_path / "reports"),
        "data.image_size": 32,
        "data.box_file": str(tmp_path / "boxes.xlsx"),
        "data.box_value": "max_box",
    })
    ctx = StageContext.create(cfg, "claro_preprocess")
    stack, meta = run_claro_preprocess(ctx)
    assert stack.shape == (3, 1, 32, 32)
    assert sorted(f"{p}_{s}" for p, s in meta) == sorted(boxed)
    assert len(list((ctx.run.interim_dir / "stylegan").glob("*.tif"))) == 3


def test_xlsx_roundtrip(tmp_path):
    from gan_discovery_pso_tpu.data.xlsx import read_manifest, read_xlsx, write_xlsx

    cols = {"img ID": ["A_1", "B_2", "C_3"], "max_box": ["[1, 2, 3, 4]"] * 3,
            "n": [1.5, 2.0, 3.25]}
    p = write_xlsx(tmp_path / "m.xlsx", cols)
    got = read_xlsx(p)
    assert got["img ID"] == cols["img ID"]
    assert got["max_box"] == cols["max_box"]
    assert got["n"] == cols["n"]
    # read_manifest dispatches on suffix; csv path too
    import csv

    with open(tmp_path / "m.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["img ID", "max_box"])
        w.writeheader()
        w.writerows([{"img ID": i, "max_box": b}
                     for i, b in zip(cols["img ID"], cols["max_box"])])
    got_csv = read_manifest(tmp_path / "m.csv")
    assert got_csv["img ID"] == cols["img ID"]


def test_xlsx_multisheet_picks_lowest_numbered_sheet(tmp_path):
    """Sheet selection must follow sheet numbering, not zip-entry order."""
    import zipfile

    from gan_discovery_pso_tpu.data.xlsx import read_xlsx, write_xlsx

    # start from a valid single-sheet file, then inject a DECOY sheet2 whose
    # zip entry comes FIRST
    p = write_xlsx(tmp_path / "m.xlsx", {"img ID": ["right"]})
    decoy = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>img ID</t></is></c></row>'
        '<row r="2"><c r="A2" t="inlineStr"><is><t>WRONG</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    src = zipfile.ZipFile(p)
    out = tmp_path / "multi.xlsx"
    with zipfile.ZipFile(out, "w") as zf:
        zf.writestr("xl/worksheets/sheet2.xml", decoy)  # first zip entry
        for item in src.namelist():
            zf.writestr(item, src.read(item))
    src.close()
    got = read_xlsx(out)
    assert got["img ID"] == ["right"]


def test_umap_smooth_knn_rho_skips_duplicate_neighbors():
    """rho is the nearest STRICTLY-positive distance even when duplicate
    points put zeros in the leading kNN columns."""
    from gan_discovery_pso_tpu.data import medical  # noqa: F401 (import check)
    from gan_discovery_pso_tpu.analysis.umap_impl import _smooth_knn

    dists = np.array([[0.0, 0.5, 1.0],   # duplicate nearest neighbor
                      [0.2, 0.4, 0.9],   # normal row
                      [0.0, 0.0, 0.0]],  # all duplicates -> rho 0
                     np.float64)
    rho, sigma = _smooth_knn(dists, k=3)
    np.testing.assert_allclose(rho, [0.5, 0.2, 0.0])
    assert np.all(sigma > 0)


def test_sliding_window_dataset_mat_and_png(tmp_path):
    """DatasetSlidingWindowClaro/Aerts parity (reference util_data.py:358-420):
    manifest rows → {id}_{slice}.mat under the flavor's directory layout,
    loader = nan-fill → resize → minmax → optional [-1,1]."""
    import scipy.io as sio

    from gan_discovery_pso_tpu.data.medical import (
        load_sliding_window_dataset,
        load_slice_image,
        slice_loader,
    )

    cfg_data = {"channel": 1, "image_size": 32, "nan_cutoff": 0.5,
                "rescale_minus_1_plus_1": True}
    # claro layout: data_dir/channel/image_size/nan_cutoff/
    img_dir = tmp_path / "sw" / "1" / "32" / "0.5"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(2)
    manifest = {"id": [], "id_slice": [], "label": []}
    for i, pid in enumerate(("P1", "P2")):
        arr = rng.uniform(-1000, 1000, (48, 48)).astype(np.float32)
        arr[0, 0] = np.nan  # exercise the NaN fill
        sio.savemat(img_dir / f"{pid}_{i}.mat", {"img": arr})
        manifest["id"].append(pid)
        manifest["id_slice"].append(float(i))  # xlsx numbers arrive as float
        manifest["label"].append(float(i % 2))

    ds = load_sliding_window_dataset(manifest, tmp_path / "sw", cfg_data,
                                     flavor="claro")
    assert ds.images.shape == (2, 1, 32, 32)
    assert ds.images.min() >= -1.0 and ds.images.max() <= 1.0
    assert tuple(ds.labels) == (0, 1)
    assert ds.patient_ids == ("P1", "P2") and ds.slice_ids == ("0", "1")

    # aerts layout omits the nan_cutoff segment
    img_dir2 = tmp_path / "sw" / "1" / "32"
    sio.savemat(img_dir2 / "P1_0.mat", {"img": rng.rand(32, 32).astype(np.float32)})
    ds2 = load_sliding_window_dataset(
        {"id": ["P1"], "id_slice": ["0"], "label": [0]},
        tmp_path / "sw", cfg_data, flavor="aerts")
    assert ds2.images.shape == (1, 1, 32, 32)

    # .png branch of the extension-dispatched loader (util_data.py:145-154)
    png = tmp_path / "x.png"
    Image.fromarray((rng.rand(20, 20) * 255).astype(np.uint8)).save(png)
    img = load_slice_image(png)
    assert img.shape == (20, 20) and img.dtype == np.float32
    x = slice_loader(png, 16)
    assert x.shape == (1, 16, 16) and 0.0 <= x.min() and x.max() <= 1.0


def test_sliding_window_numeric_ids_and_empty_cells(tmp_path):
    """xlsx numeric cells arrive as float: a patient id of 12.0 must map to
    12_5.mat (not 12.0_5.mat), and an empty manifest cell must be diagnosed
    with its row index instead of a bare TypeError."""
    import pytest
    import scipy.io as sio

    from gan_discovery_pso_tpu.data.medical import load_sliding_window_dataset

    cfg_data = {"channel": 1, "image_size": 16, "nan_cutoff": 0.5}
    img_dir = tmp_path / "sw" / "1" / "16" / "0.5"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    sio.savemat(img_dir / "12_5.mat", {"img": rng.rand(16, 16).astype(np.float32)})

    ds = load_sliding_window_dataset(
        {"id": [12.0], "id_slice": [5.0], "label": [1.0]},
        tmp_path / "sw", cfg_data, flavor="claro")
    assert ds.patient_ids == ("12",) and ds.slice_ids == ("5",)

    with pytest.raises(ValueError, match="manifest row 0"):
        load_sliding_window_dataset(
            {"id": [12.0], "id_slice": [5.0], "label": [None]},
            tmp_path / "sw", cfg_data, flavor="claro")


def test_xlsx_error_and_empty_value_cells(tmp_path):
    """Error-type cells (#DIV/0!) and empty <v/> elements must read as
    missing cells, not abort the manifest with float('#DIV/0!')."""
    import zipfile

    from gan_discovery_pso_tpu.data.xlsx import read_xlsx, write_xlsx

    p = write_xlsx(tmp_path / "m.xlsx", {"a": [1.0], "b": [2.0]})
    with zipfile.ZipFile(p) as zf:
        contents = {n: zf.read(n) for n in zf.namelist()}
    sheet = contents["xl/worksheets/sheet1.xml"].decode()
    # replace the data-row cells with an error cell and an empty <v/>
    import re

    row2 = re.search(r'<row r="2".*?</row>', sheet).group(0)
    new_row2 = ('<row r="2"><c r="A2" t="e"><v>#DIV/0!</v></c>'
                "<c r=\"B2\"><v/></c></row>")
    contents["xl/worksheets/sheet1.xml"] = sheet.replace(row2, new_row2).encode()
    p2 = tmp_path / "m2.xlsx"
    with zipfile.ZipFile(p2, "w") as zf:
        for n, data in contents.items():
            zf.writestr(n, data)
    out = read_xlsx(p2)
    assert out["a"] == [None] and out["b"] == [None]


def test_cv_evaluator_single_class_fold_auc_nan():
    """A fold whose labels are all one class degrades auc to nan like the
    other ratio metrics instead of raising inside roc_auc_score."""
    from gan_discovery_pso_tpu.analysis.reporting import CvEvaluator

    ev = CvEvaluator()
    ev.add_fold([1, 1, 1], [0.9, 0.8, 0.7])
    rows = ev.fold_metrics()
    assert np.isnan(rows[0]["auc"])
    assert rows[0]["recall"] == 1.0


def test_xlsx_duplicate_header_raises(tmp_path):
    """Two columns sharing a name would silently interleave into one dict
    key; the reader must refuse instead."""
    import pytest

    from gan_discovery_pso_tpu.data.xlsx import read_xlsx, write_xlsx

    # write_xlsx takes a dict (can't duplicate); inject the dupe into the
    # sheet XML directly
    import zipfile

    p = write_xlsx(tmp_path / "m.xlsx", {"label": ["a"], "other": ["b"]})
    with zipfile.ZipFile(p) as zf:
        names = zf.namelist()
        contents = {n: zf.read(n) for n in names}
    sheet = contents["xl/worksheets/sheet1.xml"].decode()
    sheet = sheet.replace("<is><t>other</t></is>", "<is><t>label</t></is>")
    contents["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(p, "w") as zf:
        for n, data in contents.items():
            zf.writestr(n, data)
    with pytest.raises(ValueError, match="duplicate header"):
        read_xlsx(p)


def test_xlsx_empty_header_row_raises_clearly(tmp_path):
    """A styled-but-empty first row serializes as `<row r="1"/>`; the reader
    must raise a manifest diagnostic, not `max() arg is an empty sequence`."""
    import zipfile

    import pytest

    from gan_discovery_pso_tpu.data.xlsx import read_xlsx, write_xlsx

    p = write_xlsx(tmp_path / "m.xlsx", {"label": ["a"]})
    with zipfile.ZipFile(p) as zf:
        contents = {n: zf.read(n) for n in zf.namelist()}
    sheet = contents["xl/worksheets/sheet1.xml"].decode()
    # blank out row 1's cells, keeping the row element itself
    import re

    sheet = re.sub(r'<row r="1">.*?</row>', '<row r="1"/>', sheet)
    contents["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(p, "w") as zf:
        for n, data in contents.items():
            zf.writestr(n, data)
    with pytest.raises(ValueError, match="first worksheet row is empty"):
        read_xlsx(p)


def test_xlsx_cells_without_r_attribute_position_sequentially(tmp_path):
    """The OOXML c element's r= attribute is optional — cells without it sit
    one column right of the previous cell (streaming writers omit it). They
    must NOT all collapse onto column A."""
    import re
    import zipfile

    from gan_discovery_pso_tpu.data.xlsx import read_xlsx, write_xlsx

    p = write_xlsx(tmp_path / "m.xlsx",
                   {"id": [1.0, 2.0], "name": ["a", "b"], "score": [0.5, 0.25]})
    with zipfile.ZipFile(p) as zf:
        contents = {n: zf.read(n) for n in zf.namelist()}
    sheet = re.sub(r' r="[A-Z]+\d+"', "",
                   contents["xl/worksheets/sheet1.xml"].decode())
    contents["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(p, "w") as zf:
        for n, data in contents.items():
            zf.writestr(n, data)
    got = read_xlsx(p)
    assert got == {"id": [1.0, 2.0], "name": ["a", "b"], "score": [0.5, 0.25]}


def test_xlsx_nonfinite_floats_write_as_empty_cells(tmp_path):
    """xsd:double has no nan/inf literal — <v>nan</v> makes Excel declare
    the workbook corrupt. Non-finite metrics (CvEvaluator folds with
    tp+fp==0) must come back as empty (None) cells."""
    import numpy as np

    from gan_discovery_pso_tpu.data.xlsx import read_xlsx, write_xlsx

    cols = {"precision": [float("nan"), 0.5],
            "recall": [float("inf"), np.float32("-inf")]}
    p = write_xlsx(tmp_path / "m.xlsx", cols)
    raw = open(p, "rb").read()
    assert b"nan" not in raw and b"inf" not in raw
    got = read_xlsx(p)
    assert got["precision"] == [None, 0.5]
    assert got["recall"] == [None, None]


def test_xlsx_numpy_scalars_roundtrip_numeric(tmp_path):
    """np.int64 / np.float32 cells must write as numeric <v> cells (they are
    not int/float subclasses), so they read back as float, not str."""
    import numpy as np

    from gan_discovery_pso_tpu.data.xlsx import read_xlsx, write_xlsx

    cols = {"id_slice": list(np.arange(3, dtype=np.int64)),
            "score": list(np.linspace(0, 1, 3, dtype=np.float32))}
    p = write_xlsx(tmp_path / "m.xlsx", cols)
    got = read_xlsx(p)
    assert got["id_slice"] == [0.0, 1.0, 2.0]
    assert all(isinstance(v, float) for v in got["id_slice"] + got["score"])


def test_claro_preprocess_zero_match_raises(tmp_path):
    """Mismatched manifests (0 slice ids in common) must raise a diagnostic,
    not crash in np.stack deep inside prepare_patient_dataset."""
    import pytest

    from gan_discovery_pso_tpu.data.xlsx import write_xlsx

    dataset = "claro_prospettivo"
    _write_patient_tiffs(tmp_path, dataset, patients=("PAT1",), n_slices=1)
    interim_ds = tmp_path / "interim" / dataset
    interim_ds.mkdir(parents=True)
    write_xlsx(interim_ds / f"patients_info_{dataset}.xlsx",
               {"image": ["PAT1_0.tif"]})
    # box manifest ids don't intersect the patients_info ids
    write_xlsx(tmp_path / "boxes.xlsx",
               {"img ID": ["OTHER_9"], "max_box": ["[0, 0, 4, 4]"]})
    cfg = load_config("configs/claro_preprocess.yaml", overrides={
        "data.data_dir": str(tmp_path / "raw"),
        "data.interim_dir": str(tmp_path / "interim"),
        "data.model_dir": str(tmp_path / "models"),
        "data.reports_dir": str(tmp_path / "reports"),
        "data.image_size": 32,
        "data.box_file": str(tmp_path / "boxes.xlsx"),
        "data.box_value": "max_box",
    })
    ctx = StageContext.create(cfg, "claro_preprocess")
    with pytest.raises(ValueError, match="matched 0 slices"):
        run_claro_preprocess(ctx)
