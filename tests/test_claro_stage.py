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
    exported = list((ctx.run.interim_dir / "tiff_export").glob("*.tif"))
    assert len(exported) == 4
    # the claro yaml's string class fields parse as 1-tuples
    assert ctx.data_cfg.iid_classes == ("claro_retrospettivo",)
