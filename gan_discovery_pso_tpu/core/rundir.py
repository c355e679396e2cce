"""Run-directory management with the reference's naming contract.

The reference names each experiment run ``{id:05d}--{module}.py`` and scans
sibling directories to allocate the next id
(reference src/utils/util_general.py:287-326), snapshots the config YAML and
the full source tree into the log dir
(reference src/training/pso_discovery.py:89-110). Downstream stages locate
upstream artifacts by these directory names (the `prerequisites:` block,
reference configs/dcgan_mnist.yaml:33-44), so the scheme is part of the
cross-stage file-system API and is kept bit-identical here.
"""

from __future__ import annotations

import json
import re
import shutil
import time
from pathlib import Path

import yaml

_ID_RE = re.compile(r"^(\d+)--(.+)$")


def get_next_run_id(run_root: str | Path, module: str) -> int:
    """Next run id for `module` under `run_root`.

    Scans directories named ``{id}--{module}`` (ignores everything else,
    matching reference src/utils/util_general.py:307-326) and returns
    max(id)+1, starting at 1.
    """
    run_root = Path(run_root)
    run_id = 1
    if run_root.is_dir():
        for d in run_root.iterdir():
            if not d.is_dir():
                continue
            m = _ID_RE.match(d.name)
            if m is not None and m.group(2) == module:
                run_id = max(run_id, int(m.group(1)) + 1)
    return run_id


def run_name(run_id: int, module: str) -> str:
    return f"{run_id:05d}--{module}"


class RunDir:
    """One experiment run's directory layout + provenance snapshot.

    Layout (mirroring the reference's reports/models/interim triple,
    reference src/training/pso_discovery.py:89-118):

        <reports_root>/<dataset>/<00001--module>/     reports + log.txt + cfg
        <models_root>/<dataset>/<00001--module>/      checkpoints
        <interim_root>/<dataset>/<00001--module>/     particle pickles etc.
    """

    def __init__(
        self,
        module: str,
        dataset: str,
        reports_root: str | Path = "./reports",
        models_root: str | Path = "./models",
        interim_root: str | Path = "./data/interim",
        run_id: int | None = None,
    ):
        self.module = module
        self.dataset = dataset
        reports_root = Path(reports_root) / dataset
        if run_id is None:
            run_id = get_next_run_id(reports_root, module)
        self.run_id = run_id
        self.name = run_name(run_id, module)

        self.reports_dir = reports_root / self.name
        self.models_dir = Path(models_root) / dataset / self.name
        self.interim_dir = Path(interim_root) / dataset / self.name
        for d in (self.reports_dir, self.models_dir, self.interim_dir):
            d.mkdir(parents=True, exist_ok=True)
        self._t0 = time.time()

    # -- reference report layout (every entry script creates these two
    #    subdirs up front, e.g. src/training/cae.py:127-130) ----------------

    @property
    def general_dir(self) -> Path:
        """`general/` — superimages, img_loss panels, latent-space plots,
        posterior histograms, history pickles (reference general_reports_dir)."""
        d = self.reports_dir / "general"
        d.mkdir(parents=True, exist_ok=True)
        return d

    @property
    def plot_dir(self) -> Path:
        """`training_plot/` — per-metric training curves (reference
        plot_training_dir)."""
        d = self.reports_dir / "training_plot"
        d.mkdir(parents=True, exist_ok=True)
        return d

    # -- provenance ---------------------------------------------------------

    def snapshot_config(self, cfg) -> None:
        """Write the resolved config (reference saves `configuration.yaml`,
        src/training/pso_discovery.py:102-104)."""
        data = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
        with open(self.reports_dir / "configuration.yaml", "w") as f:
            yaml.safe_dump(data, f, sort_keys=False)

    def snapshot_source(self, package_root: str | Path | None = None) -> None:
        """Copy the framework source into the run dir
        (reference src/training/pso_discovery.py:105-110)."""
        if package_root is None:
            package_root = Path(__file__).resolve().parents[1]
        package_root = Path(package_root)
        dst = self.reports_dir / "src" / package_root.name
        if dst.exists():
            shutil.rmtree(dst)
        shutil.copytree(
            package_root,
            dst,
            ignore=shutil.ignore_patterns("__pycache__", "*.pyc", ".git"),
        )

    # -- timing (replaces the reference's timing.pkl,
    #    src/training/pso_discovery.py:242-251) -----------------------------

    def write_timing(self, timings: dict) -> None:
        payload = {"overall_time": time.time() - self._t0, **timings}
        with open(self.reports_dir / "timing.json", "w") as f:
            json.dump(payload, f, indent=2)
        # literal-parity twin of the reference's pickle artifact — including
        # its 'overall_time' key (general/timing.pkl,
        # src/training/pso_discovery.py:246-249)
        import pickle

        general = self.reports_dir / "general"
        general.mkdir(parents=True, exist_ok=True)
        with open(general / "timing.pkl", "wb") as f:
            pickle.dump(payload, f)

    def write_overall_history(self, history: dict) -> None:
        """`general/overall_history.pkl` — the history pickle every
        reference entry script writes at exit (e.g. cae.py:228-231,
        dcgan.py:211-214, cnn.py:200-205) — plus a readable JSON twin (the
        snapshot tooling commits only compact machine-readable evidence,
        tools/snapshot_histories.py; non-serializable leaves degrade to
        repr rather than failing the stage)."""
        import pickle

        general = self.reports_dir / "general"
        general.mkdir(parents=True, exist_ok=True)
        with open(general / "overall_history.pkl", "wb") as f:
            pickle.dump(history, f)

        import numpy as np

        def enc(o):
            if isinstance(o, dict):
                return {str(k): enc(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                return [enc(v) for v in o]
            if o is None or isinstance(o, (str, bool, int, float)):
                return o
            try:
                a = np.asarray(o)
                if a.ndim == 0:
                    return a.item()
                if a.size <= 65536 and a.dtype.kind in "bifu":
                    return a.tolist()
            except Exception:
                pass
            return repr(o)

        with open(general / "overall_history.json", "w") as f:
            json.dump(enc(history), f, indent=2, default=repr)

    def __repr__(self):
        return f"RunDir({self.name}, reports={self.reports_dir})"


def resolve_prerequisite(path_template: str, dataset: str | None = None) -> Path:
    """Resolve a `prerequisites:` entry (reference configs/dcgan_mnist.yaml:33-44).

    Entries look like './models/mnist/00001--cae.py'; they are plain paths,
    returned as-is, but validated to exist so failures happen at startup
    rather than mid-pipeline (replaces the reference's interactive
    `define_source_path` prompt, src/utils/util_general.py:80-106).
    """
    p = Path(path_template)
    if not p.exists():
        raise FileNotFoundError(
            f"prerequisite artifact dir not found: {p} — run the upstream stage first"
        )
    return p
