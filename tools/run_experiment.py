"""Full-width reference-experiment driver (VERDICT r2 item 1, hardened r4).

Executes the reference's complete experiment chain on the real TPU through
the public CLI, one stage per subprocess, in the reference's execution order
(reference src/bash/start.sh:11-36, readme_cnr.txt:46-87):

    cae -> classifiers -> cnn_multipatient -> cnn battery
        -> dcgan (latent_dim in {2, 10, 100}, 100 epochs, per-epoch eval)
        -> pso-discovery (all 8 IiD classes, 50 iters) per dim
        -> inverter (pix_rec + pix_fea_rec_adv) at dim 10
        -> iid/ood extract -> pso-inverter (OoD patient 5)
        -> regularize-inverter (+statistics)
        -> vqvae (dim 100) -> pixelcnn prior
        -> pso-analysis legs (projection, clustering, distance,
           pso-inverter-analysis)

Dims {2, 10, 100} cover the reference sweep's endpoints + its analysis dim
(start.sh:11 lists 9 dims); extra dims can be appended via GDPT_DIMS (a
comma list) to fill the rest of the reference's latent-dim curve. Training
stages run with --fast-math (MXU bf16 passes): the bench's fp32-parity gate
measured max |g_best_fp32 - g_best_bf16| = 3.1e-4 on this exact workload,
and HIGHEST-precision conv gradients wedge this backend's compiler
(CLAUDE.md).

Round-4 hardening (VERDICT r3 "what's weak" 1/2 + ADVICE r3 medium):

* every leg records the run dirs it CREATED (diff of the three artifact
  roots before/after) in its timings.jsonl line, and downstream legs
  resolve --path-gan/--path-pso/... from those records — never from
  ordinal glob position, so retried or partial runs can't silently pair a
  leg with the wrong-dim checkpoint;
* legs declare dependencies; a failure only skips its dependents
  (recorded as rc="skipped" with the reason) while independent subtrees
  keep running, and the driver exits nonzero listing every failed leg;
* a failed leg's freshly created run dirs are quarantined under
  experiments/failed_runs/<leg>/ so the artifact trees only ever hold
  completed runs;
* the vqvae leg overrides data.{iid,ood}_classes to the discovery run's
  split (the reference ships vqvae.yaml with a DIFFERENT split than
  dcgan_mnist.yaml — /root/reference/configs/vqvae.yaml:17-24 vs
  dcgan_mnist.yaml:16-23 — which is exactly the mismatch pso/io.py
  diagnoses).

Already-successful legs (rc==0 in the jsonl) are skipped, so the driver is
resumable after interruption. Data note: this environment has no MNIST on
disk and zero egress, so every stage runs on the deterministic
synthetic-digit fallback (data/mnist.py, ImageDataset.source ==
"synthetic"); documented in docs/RESULTS.md.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
EXP = REPO / "experiments"
LOGS = EXP / "logs"
FAILED = EXP / "failed_runs"
TIMINGS = EXP / "timings.jsonl"
PY = sys.executable
STAGE_TIMEOUT_S = int(os.environ.get("GDPT_STAGE_TIMEOUT_S", 4 * 3600))

# the three mirrored artifact roots every RunDir creates (core/rundir.py:55-57)
ROOTS = {
    "models": "models/mnist",
    "interim": "data/interim/mnist",
    "reports": "reports/mnist",
}

# The discovery chain's class split (configs/dcgan_mnist.yaml). vqvae.yaml
# ships a different one; downstream stages must match the discovery run's.
DISCOVERY_SPLIT = [
    "data.iid_classes=[0,2,3,4,6,7,8,9]",
    "data.ood_classes=[1,5]",
]

# Run dirs produced by the round-3 legs, which predate run-dir recording.
# Derived from experiments/timings.jsonl argv cross-references; used only
# when a leg has no recorded run_dirs.
LEGACY_RUN_DIRS = {
    "cae": "00001--cae",
    "classifiers": "00002--classifiers",
    "cnn_multipatient": "00001--cnn_multipatient",
    "cnn_battery": "00001--cnn",
    "dcgan_z2": "00001--dcgan",
    "dcgan_z10": "00002--dcgan",
    "dcgan_z100": "00003--dcgan",
    "pso_z2": "00001--pso_discovery",
    "pso_z10": "00002--pso_discovery",
    "pso_z100": "00003--pso_discovery",
    "inverter_pixrec_z10": "00001--inverter",
    "inverter_adv_z10": "00002--inverter",
    "iid_extract_z10": "00001--iid_extract",
    "ood_extract_z10": "00001--ood_extract",
    "pso_inverter_p5_z10": "00001--pso_inverter",
    "regularize_inverter_z10": "00001--regularize_inverter",
    "regularize_inverter_stats_z10": "00001--regularize_inverter_statistics",
}


def dim_sets(dim: int) -> list[str]:
    # same override triple the CLI `sweep` applies per latent dim
    return ["--set", f"trainer_gan.z_dim={dim}", f"trainer_pso.dim_space={dim}",
            f"model_inverter.latent_space={dim}"]


def _dir_has_files(p: Path) -> bool:
    return p.is_dir() and any(f.is_file() for f in p.rglob("*"))


def _record_dim(rec: dict) -> str | None:
    """The z_dim the record's argv pinned, if any."""
    for a in rec.get("argv", []):
        if a.startswith("trainer_gan.z_dim="):
            return a.split("=", 1)[1]
    return None


def _rundir_dim(rec: dict) -> str | None:
    """The z_dim in the recorded run dir's configuration.yaml, if found."""
    for root, names in (rec.get("run_dirs") or {}).items():
        for name in names:
            cfg = REPO / ROOTS[root] / name / "configuration.yaml"
            if cfg.is_file():
                m = re.search(r"^\s*z_dim:\s*(\d+)\s*$", cfg.read_text(), re.M)
                if m:
                    return m.group(1)
    return None


def record_valid(rec: dict) -> bool:
    """A leg's rc==0 record only counts if its artifacts still EXIST and
    still BELONG to it.

    Containers are recycled between rounds: timings.jsonl (committed)
    survives while the gitignored artifact roots are wiped, so a record can
    point at nothing — treating it as done would skip the leg AND starve
    every dependent (round-5 hardening). Every recorded run dir must be
    present and at least one must contain files (the run-root seeding below
    creates EMPTY placeholder dirs for committed snapshot names, which must
    not validate).

    Existence is NOT ownership: only snapshot names that were committed get
    placeholder seeds, so after a recycle the run-id allocator can hand a
    stale record's dir name to a NEW run of a different leg (observed live:
    the rebuilt dcgan_z10 took 00008--dcgan, which round-4's dcgan_z20
    record pointed at — z20 then wrongly skipped as 'already done'). When
    the record pinned a z_dim, require the run dir's configuration.yaml to
    agree before trusting it."""
    dirs = [REPO / ROOTS[root] / name
            for root, names in (rec.get("run_dirs") or {}).items()
            for name in names]
    if not dirs:
        name = LEGACY_RUN_DIRS.get(rec["leg"])
        if name is None:
            return True  # leg produces no run dirs; nothing to validate
        dirs = [REPO / rel / name for rel in ROOTS.values()]
        return any(_dir_has_files(d) for d in dirs)
    if not (all(d.is_dir() for d in dirs) and any(_dir_has_files(d) for d in dirs)):
        return False
    want = _record_dim(rec)
    have = _rundir_dim(rec)
    return want is None or have is None or want == have


def load_records() -> dict[str, dict]:
    """leg -> its latest rc==0 timings record (for resolution + resume),
    dropping records whose artifacts no longer exist (those legs re-run)."""
    recs: dict[str, dict] = {}
    if TIMINGS.exists():
        for line in TIMINGS.read_text().splitlines():
            rec = json.loads(line)
            if rec.get("rc") == 0:
                if record_valid(rec):
                    recs[rec["leg"]] = rec
                else:
                    recs.pop(rec["leg"], None)
                    print(f"[experiment] {rec['leg']}: recorded artifacts "
                          "missing on disk — will re-run", flush=True)
    return recs


def seed_run_roots() -> None:
    """Recreate committed snapshot names as EMPTY placeholder run dirs.

    experiments/histories/ keeps (committed) snapshots of earlier rounds'
    run dirs while the live artifact roots are wiped with the container;
    without the names on disk the run-id allocator (core/rundir.py
    get_next_run_id) would restart at 00001 and new runs would COLLIDE with
    committed snapshot names. Empty placeholders keep the counter moving
    forward; they fail record validation (no files), so stale records still
    re-run, and summarize_results prefers snapshot content over empty live
    dirs."""
    hist = EXP / "histories"
    if not hist.is_dir():
        return
    for d in sorted(hist.iterdir()):
        if d.is_dir() and "--" in d.name:
            for rel in ROOTS.values():
                (REPO / rel / d.name).mkdir(parents=True, exist_ok=True)


seed_run_roots()
RECORDS = load_records()
# every leg name ever written to timings.jsonl (any rc) — skip records are
# only appended for legs with NO prior record, so resumed invocations can't
# accumulate duplicate skipped rows (ADVICE r4)
EVER_RECORDED: set[str] = set()
if TIMINGS.exists():
    EVER_RECORDED = {json.loads(line)["leg"]
                     for line in TIMINGS.read_text().splitlines()}

# stop dispatching new legs after this wall-clock instant (--deadline-min /
# GDPT_DEADLINE_MIN): a sweep must never straddle the round boundary into
# the driver's bench window again (VERDICT r4 item 7)
DEADLINE_TS: float | None = None


def produced_dir(leg: str, root: str) -> str:
    """The run dir `leg` created under `root`, from its timings record.

    Falls back to the round-3 legacy map for legs that ran before run-dir
    recording existed. Never resolves by ordinal glob position (ADVICE r3).
    """
    rec = RECORDS.get(leg)
    names = (rec or {}).get("run_dirs", {}).get(root) or []
    if len(names) > 1:
        raise RuntimeError(f"{leg} recorded multiple {root} run dirs: {names}")
    name = names[0] if names else LEGACY_RUN_DIRS.get(leg)
    if name is None:
        raise FileNotFoundError(f"no recorded {root} run dir for leg {leg}")
    p = REPO / ROOTS[root] / name
    if not p.is_dir():
        raise FileNotFoundError(f"recorded run dir for {leg} missing: {p}")
    return str(p)


def snapshot_roots() -> dict[str, set[str]]:
    return {
        root: {d.name for d in (REPO / rel).iterdir() if d.is_dir()}
        if (REPO / rel).is_dir() else set()
        for root, rel in ROOTS.items()
    }


def quarantine(leg: str, new_dirs: dict[str, list[str]]) -> None:
    """Move a failed leg's freshly created run dirs out of the artifact
    trees so ordinal allocation and downstream globs only ever see
    completed runs (VERDICT r3 weak #1)."""
    stamp = time.strftime("%Y%m%d-%H%M%S")
    for root, names in new_dirs.items():
        for name in names:
            src = REPO / ROOTS[root] / name
            dst = FAILED / f"{leg}-{stamp}" / root / name
            dst.parent.mkdir(parents=True, exist_ok=True)
            if src.is_dir():
                shutil.move(str(src), str(dst))
                print(f"[experiment] quarantined {src} -> {dst}", flush=True)


def wait_for_backend(max_tries: int = 20, probe_timeout_s: int = 180) -> None:
    """Block until the TPU backend initializes in a probe SUBPROCESS.

    The axon tunnel admits one client; right after a leg exits, the lease
    can linger and the NEXT process's jax.devices() hangs in a futex forever
    (observed 35+ min). A bounded probe per attempt (the hang is in-process,
    so it must be a subprocess) with sleeps between attempts rides out the
    lease window instead of wedging a whole leg."""
    for attempt in range(max_tries):
        try:
            p = subprocess.run(
                [PY, "-c", "import jax; jax.devices(); print('ok')"],
                timeout=probe_timeout_s, capture_output=True, text=True,
                cwd=REPO,
            )
            if p.returncode == 0 and "ok" in p.stdout:
                if attempt:
                    print(f"[experiment] backend up after {attempt + 1} probes",
                          flush=True)
                return
        except subprocess.TimeoutExpired:
            pass
        print(f"[experiment] backend probe {attempt + 1}/{max_tries} failed; "
              "waiting 60s", flush=True)
        time.sleep(60)
    sys.exit("[experiment] TPU backend never came up")


class Driver:
    def __init__(self, only: set[str] | None = None):
        self.only = only
        # leg -> "ok" | "failed" | "skipped"
        self.status: dict[str, str] = {leg: "ok" for leg in RECORDS}

    def record(self, payload: dict) -> None:
        EVER_RECORDED.add(payload["leg"])
        with open(TIMINGS, "a") as tf:
            tf.write(json.dumps(payload) + "\n")

    def _record_skip(self, name: str, reason: str) -> None:
        # only the FIRST skip of a never-run leg is recorded: resumed
        # invocations must not accumulate duplicate skipped rows in
        # timings.jsonl / RESULTS.md (ADVICE r4)
        if name not in EVER_RECORDED:
            self.record({"leg": name, "rc": "skipped", "reason": reason})
            EVER_RECORDED.add(name)

    def leg(self, name: str, argv_fn, deps: tuple[str, ...] = ()) -> None:
        if self.only and name not in self.only:
            return
        if self.status.get(name) == "ok":
            print(f"[experiment] {name}: already done, skipping", flush=True)
            return
        if DEADLINE_TS is not None and time.time() > DEADLINE_TS:
            print(f"[experiment] {name}: deadline passed — not dispatched",
                  flush=True)
            self.status[name] = "deadline"
            return
        bad = [d for d in deps if self.status.get(d) != "ok"]
        if bad:
            reason = ", ".join(f"{d}={self.status.get(d, 'not run')}" for d in bad)
            print(f"[experiment] {name}: SKIPPED (deps: {reason})", flush=True)
            if not any(self.status.get(d) == "deadline" for d in bad):
                self._record_skip(name, reason)
            self.status[name] = "skipped"
            return
        try:
            argv_tail = argv_fn()
        except (FileNotFoundError, RuntimeError) as e:
            print(f"[experiment] {name}: SKIPPED (resolution: {e})", flush=True)
            self._record_skip(name, str(e))
            self.status[name] = "skipped"
            return
        wait_for_backend()
        argv = [PY, "-m", "gan_discovery_pso_tpu.cli"] + argv_tail
        log_path = LOGS / f"{name}.log"
        print(f"[experiment] {name}: {' '.join(argv[2:])}", flush=True)
        before = snapshot_roots()
        t0 = time.time()
        with open(log_path, "w") as lf:
            lf.write(f"$ {' '.join(argv)}\n")
            lf.flush()
            try:
                rc = subprocess.run(argv, cwd=REPO, stdout=lf,
                                    stderr=subprocess.STDOUT,
                                    timeout=STAGE_TIMEOUT_S).returncode
            except subprocess.TimeoutExpired:
                rc = -9
                lf.write(f"\n[experiment] TIMEOUT after {STAGE_TIMEOUT_S}s\n")
        wall = time.time() - t0
        after = snapshot_roots()
        new_dirs = {root: sorted(after[root] - before[root]) for root in ROOTS}
        rec = {"leg": name, "rc": rc, "wall_s": round(wall, 1),
               "argv": argv[2:], "log": str(log_path),
               "run_dirs": {k: v for k, v in new_dirs.items() if v}}
        if rc == 0:
            RECORDS[name] = rec
            self.status[name] = "ok"
            print(f"[experiment] {name}: ok in {wall / 60:.1f} min", flush=True)
        else:
            self.status[name] = "failed"
            print(f"[experiment] {name}: FAILED rc={rc} in {wall / 60:.1f} min "
                  f"(see {log_path})", flush=True)
            quarantine(name, new_dirs)
            rec["quarantined"] = rec.pop("run_dirs")
        self.record(rec)


def main(only: set[str] | None = None) -> int:
    EXP.mkdir(exist_ok=True)
    LOGS.mkdir(exist_ok=True)
    dv = Driver(only)
    fm = ["--fast-math"]

    # ---- prerequisites (reference readme_cnr.txt:46-60)
    dv.leg("cae", lambda: ["cae"] + fm)
    dv.leg("classifiers",
           lambda: ["classifiers", "--path-cae", produced_dir("cae", "models")],
           deps=("cae",))
    dv.leg("cnn_multipatient", lambda: ["cnn-multipatient"] + fm)
    dv.leg("cnn_battery", lambda: ["cnn"] + fm)

    # ---- per-dim GAN training + discovery (start.sh:11-24)
    dims = tuple(int(x) for x in
                 os.environ.get("GDPT_DIMS", "2,10,100").split(","))
    for dim in dims:
        dv.leg(f"dcgan_z{dim}", lambda dim=dim: (
            ["dcgan", "--path-cae", produced_dir("cae", "models"),
             "--path-classifiers", produced_dir("classifiers", "models")]
            + dim_sets(dim) + fm), deps=("cae", "classifiers"))
        dv.leg(f"pso_z{dim}", lambda dim=dim: (
            ["pso-discovery", "--batch-classes",
             "--path-gan", produced_dir(f"dcgan_z{dim}", "models"),
             "--path-cnn", produced_dir("cnn_multipatient", "models")]
            + dim_sets(dim) + fm),
            deps=(f"dcgan_z{dim}", "cnn_multipatient"))

    # ---- inversion at the reference's analysis dim (readme_cnr.txt:74-87)
    gan10 = lambda: produced_dir("dcgan_z10", "models")  # noqa: E731
    # extraction uses the adversarial inverter (reference start.sh:29-31
    # points --path_inverter at 00002--inverter, the pix_fea_rec_adv run)
    inv10 = lambda: produced_dir("inverter_adv_z10", "models")  # noqa: E731

    dv.leg("inverter_pixrec_z10", lambda: (
        ["inverter", "--path-gan", gan10()] + dim_sets(10) + fm),
        deps=("dcgan_z10",))
    dv.leg("inverter_adv_z10", lambda: (
        ["inverter", "--path-gan", gan10(),
         "--path-cnn", produced_dir("cnn_multipatient", "models"),
         "--set", "trainer_inverter.training_function=pix_fea_rec_adv"]
        + dim_sets(10) + fm), deps=("dcgan_z10", "cnn_multipatient"))
    dv.leg("iid_extract_z10", lambda: (
        ["iid-extract", "--path-inverter", inv10(),
         "--path-gan", gan10()] + dim_sets(10) + fm),
        deps=("dcgan_z10", "inverter_adv_z10"))
    dv.leg("ood_extract_z10", lambda: (
        ["ood-extract", "--path-inverter", inv10(),
         "--path-gan", gan10()] + dim_sets(10) + fm),
        deps=("dcgan_z10", "inverter_adv_z10"))
    dv.leg("pso_inverter_p5_z10", lambda: (
        ["pso-inverter", "--ood-patient", "5",
         "--path-gan", gan10(),
         "--path-inverter", inv10(),
         "--path-cnn", produced_dir("cnn_multipatient", "models")]
        + dim_sets(10) + fm),
        deps=("dcgan_z10", "inverter_adv_z10", "cnn_multipatient"))
    # second OoD patient: the reference sweeps EVERY patient through
    # pso_inverter (start_pso_optimize.sh:3-16); patients {1, 5} are the
    # dcgan_mnist split's OoD classes, and the clustering overlay needs an
    # inverted run per OoD class
    dv.leg("pso_inverter_p1_z10", lambda: (
        ["pso-inverter", "--ood-patient", "1",
         "--path-gan", gan10(),
         "--path-inverter", inv10(),
         "--path-cnn", produced_dir("cnn_multipatient", "models")]
        + dim_sets(10) + fm),
        deps=("dcgan_z10", "inverter_adv_z10", "cnn_multipatient"))
    # The reference runs EVERY patient with BOTH fitness controls
    # (start_pso_optimize.sh:6-7: --control_pso_fitness optimize_in_training
    # AND optimize_out_training; the switch is util_discovery.py:75-80). The
    # p1/p5 legs above run the config default (optimize_in_training,
    # configs/dcgan_mnist.yaml trainer_pso_inverter); these add the
    # out-of-training control per patient. The reference nests one run dir's
    # artifacts under per-control subdirs (pso_inverter.py:128,190-194);
    # here each control is its own run dir with the control recorded in
    # configuration.yaml (docs/PARITY.md row 9).
    for pat in (5, 1):
        dv.leg(f"pso_inverter_p{pat}_out_z10", lambda pat=pat: (
            ["pso-inverter", "--ood-patient", str(pat),
             "--path-gan", gan10(),
             "--path-inverter", inv10(),
             "--path-cnn", produced_dir("cnn_multipatient", "models"),
             "--set",
             "trainer_pso_inverter.control_pso_fitness=optimize_out_training"]
            + dim_sets(10) + fm),
            deps=("dcgan_z10", "inverter_adv_z10", "cnn_multipatient"))

    dv.leg("regularize_inverter_z10", lambda: (
        ["regularize-inverter", "--path-gan", gan10(),
         "--path-inverter", inv10()] + dim_sets(10) + fm),
        deps=("dcgan_z10", "inverter_adv_z10"))
    dv.leg("regularize_inverter_stats_z10", lambda: (
        ["regularize-inverter-statistics", "--path-gan", gan10(),
         "--path-inverter", inv10(),
         "--path-pso", produced_dir("pso_z10", "interim")]
        + dim_sets(10) + fm),
        deps=("dcgan_z10", "inverter_adv_z10", "pso_z10"))

    # ---- VQ-VAE on the dim-100 generator + discovery swarm (vqvae.yaml:44)
    # with the DISCOVERY split override (vqvae.yaml ships a different one)
    dv.leg("vqvae_z100", lambda: (
        ["vqvae", "--cfg", "configs/vqvae.yaml",
         "--path-gan", produced_dir("dcgan_z100", "models"),
         "--path-pso", produced_dir("pso_z100", "interim"),
         "--set"] + DISCOVERY_SPLIT + fm),
        deps=("dcgan_z100", "pso_z100"))
    dv.leg("pixelcnn_prior_z100", lambda: (
        ["pixelcnn-prior", "--cfg", "configs/vqvae.yaml",
         "--path-vqvae", produced_dir("vqvae_z100", "models"),
         "--set"] + DISCOVERY_SPLIT + fm),
        deps=("vqvae_z100",))

    # ---- analysis legs at dim 10 (start.sh:29-36) — depend on DISCOVERY
    # outputs only, never on vqvae (VERDICT r3 weak #1)
    dv.leg("pso_analysis_z10", lambda: (
        ["pso-analysis", "--path-pso", produced_dir("pso_z10", "interim")]
        + dim_sets(10)), deps=("pso_z10",))
    dv.leg("pso_analysis_clustering_z10", lambda: (
        ["pso-analysis-clustering",
         "--path-pso", produced_dir("pso_z10", "interim"),
         "--path-ood-pso", produced_dir("pso_inverter_p1_z10", "interim"),
         "--path-ood-pso", produced_dir("pso_inverter_p5_z10", "interim")]
        + dim_sets(10)),
        deps=("pso_z10", "pso_inverter_p1_z10", "pso_inverter_p5_z10"))
    dv.leg("pso_analysis_distance_z10", lambda: (
        ["pso-analysis-distance",
         "--path-pso", produced_dir("pso_z10", "interim")]
        + dim_sets(10)), deps=("pso_z10",))
    dv.leg("pso_inverter_analysis_z10", lambda: (
        ["pso-inverter-analysis",
         "--path-pso", produced_dir("pso_z10", "interim"),
         "--path-ood-pso", produced_dir("pso_inverter_p5_z10", "interim"),
         "--ood-patient", "5"] + dim_sets(10)),
        deps=("pso_z10", "pso_inverter_p5_z10"))
    # ... and over BOTH control dirs per patient, like the reference's
    # (commented) analysis pair in start_pso_optimize.sh:12-13
    for pat, ctrl, src in ((5, "out", "pso_inverter_p5_out_z10"),
                           (1, "in", "pso_inverter_p1_z10"),
                           (1, "out", "pso_inverter_p1_out_z10")):
        dv.leg(f"pso_inverter_analysis_p{pat}_{ctrl}_z10",
               lambda pat=pat, src=src: (
                   ["pso-inverter-analysis",
                    "--path-pso", produced_dir("pso_z10", "interim"),
                    "--path-ood-pso", produced_dir(src, "interim"),
                    "--ood-patient", str(pat)] + dim_sets(10)),
               deps=("pso_z10", src))

    failed = sorted(k for k, v in dv.status.items() if v == "failed")
    skipped = sorted(k for k, v in dv.status.items() if v == "skipped")
    if failed or skipped:
        print(f"[experiment] done with failures={failed} skipped={skipped}",
              flush=True)
        return 1
    print("[experiment] all legs complete", flush=True)
    return 0


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("legs", nargs="*",
                    help="run only these legs (default: the full chain)")
    ap.add_argument("--deadline-min", type=float,
                    default=float(os.environ.get("GDPT_DEADLINE_MIN", 0)) or None,
                    help="stop DISPATCHING new legs after this many minutes "
                         "(an in-flight leg still finishes) — so a sweep can "
                         "never straddle the round boundary into the "
                         "driver's bench window")
    a = ap.parse_args()
    if a.deadline_min:
        DEADLINE_TS = time.time() + a.deadline_min * 60.0
        print(f"[experiment] deadline: no new legs after "
              f"{a.deadline_min:.0f} min", flush=True)
    raise SystemExit(main(only=set(a.legs) or None))
