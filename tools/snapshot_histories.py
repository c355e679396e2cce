"""Snapshot the full-width experiment's quality histories into the repo.

The run-dir roots (reports/, models/, data/interim/) are gitignored — a
single pso_discovery report dir is ~174 MB of per-iteration figures. This
copies ONLY the compact machine-readable evidence behind docs/RESULTS.md
into experiments/histories/<run>/ so the numbers the report cites are in
version control:

  - configuration.yaml, timing.json, log.txt (first+last 50 lines)
  - every history_*.jsonl / *.csv quality curve
  - general/overall_history.json (per-class PSO g_best / fitness series)
  - one representative figure per DCGAN run (final-epoch synthetic grid)
    and per PSO run (converged swarm grid for class 2)

Size-guarded: any file over MAX_BYTES is skipped with a note. Idempotent.
"""

from __future__ import annotations

import glob
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEST = REPO / "experiments" / "histories"
MAX_BYTES = 2_000_000


def put(src: Path, rel_root: Path) -> None:
    if not src.is_file():
        return
    if src.stat().st_size > MAX_BYTES:
        print(f"  skip (size): {src}", file=sys.stderr)
        return
    out = DEST / rel_root / src.relative_to(REPO / "reports" / "mnist" / rel_root)
    out.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy2(src, out)


def put_log_excerpt(src: Path, rel_root: Path) -> None:
    if not src.is_file():
        return
    lines = src.read_text(errors="replace").splitlines()
    body = lines if len(lines) <= 100 else (
        lines[:50] + [f"... [{len(lines) - 100} lines elided] ..."] + lines[-50:])
    out = DEST / rel_root / "log_excerpt.txt"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(body) + "\n")


def main() -> None:
    DEST.mkdir(parents=True, exist_ok=True)
    for d in sorted(glob.glob(str(REPO / "reports" / "mnist" / "*--*"))):
        run = Path(d)
        rel = Path(run.name)
        print(f"[snapshot] {run.name}", file=sys.stderr)
        for name in ("configuration.yaml", "timing.json"):
            put(run / name, rel)
        put_log_excerpt(run / "log.txt", rel)
        for pat in ("history_*.jsonl", "history_*.csv",
                    "general/history_*.jsonl", "general/overall_history.json",
                    "general/encoded_samples*.csv",
                    # analysis-stage machine-readable payloads
                    "ood_patient_*_cluster_assignment.json",
                    "distance_summary.json",
                    "ood_cluster_assignment.json"):
            for f in glob.glob(str(run / pat)):
                put(Path(f), rel)
        # one representative figure per run kind
        kind = run.name.split("--")[-1]
        if kind == "dcgan":
            grids = sorted(glob.glob(str(run / "general" / "synthetic_images_*.png")),
                           key=lambda p: int(Path(p).stem.split("_")[-1]))
            if grids:
                put(Path(grids[-1]), rel)
        elif kind in ("pso_discovery", "pso_inverter"):
            for cls_dir in ("2", "0", "5"):
                grids = sorted(
                    glob.glob(str(run / "training_plot" / cls_dir
                                  / "pso_images_*.png")),
                    key=lambda p: int(Path(p).stem.split("_")[-1]))
                if grids:
                    out = DEST / rel / "training_plot" / cls_dir / Path(grids[-1]).name
                    out.parent.mkdir(parents=True, exist_ok=True)
                    shutil.copy2(grids[-1], out)
                    break
    total = sum(f.stat().st_size for f in DEST.rglob("*") if f.is_file())
    print(f"[snapshot] wrote {total / 1e6:.1f} MB under {DEST}", file=sys.stderr)


if __name__ == "__main__":
    main()
