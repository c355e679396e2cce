"""Shared pipeline context: config + run dir + PRNG + data, one object.

Every reference entry script repeats the same preamble — yaml load, argparse,
run-dir creation, Logger tee, seed_all, loader construction (e.g.
reference src/training/pso_discovery.py:53-173). `StageContext.create`
factors that preamble once; each pipeline stage consumes the context.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

from gan_discovery_pso_tpu.core import (
    Checkpointer,
    Config,
    KeyChain,
    MetricsWriter,
    RunDir,
    load_config,
    seed_all,
)
from gan_discovery_pso_tpu.core.config import DataConfig, cfg_default
from gan_discovery_pso_tpu.core.logging import Notifier, Tee
from gan_discovery_pso_tpu.data import ImageDataset, epoch_batches, load_mnist


@dataclasses.dataclass
class StageContext:
    cfg: Config
    data_cfg: DataConfig
    run: RunDir
    keys: KeyChain
    ckpt: Checkpointer
    notify: Notifier
    # cap on images per dataset load — tiny-config integration runs
    # (SURVEY.md §4: "tiny-config end-to-end runs per pipeline stage")
    limit: int | None = None

    @classmethod
    def create(
        cls,
        cfg: Config | str | Path,
        module: str,
        overrides=None,
        run_id: int | None = None,
    ) -> "StageContext":
        if not isinstance(cfg, Config):
            cfg = load_config(cfg, overrides=overrides)
        elif overrides:
            cfg = cfg.with_overrides(overrides)
        data_cfg = DataConfig.from_config(cfg.data)
        run = RunDir(
            module,
            data_cfg.dataset,
            reports_root=data_cfg.reports_dir,
            models_root=data_cfg.model_dir,
            interim_root=data_cfg.interim_dir,
            run_id=run_id,
        )
        run.snapshot_config(cfg)
        keys = seed_all(int(cfg_default(cfg, "seed", 42)))
        return cls(
            cfg=cfg,
            data_cfg=data_cfg,
            run=run,
            keys=keys,
            ckpt=Checkpointer(run.models_dir),
            notify=Notifier(),
        )

    # -- data ---------------------------------------------------------------

    def dataset(self, split: str = "train", classes=None, drange=None) -> ImageDataset:
        if drange is None:
            drange = self.data_cfg.drange_net
        if classes is None:
            classes = self.data_cfg.iid_classes
        ds = load_mnist(
            self.data_cfg.data_dir,
            split=split,
            classes=classes,
            drange=drange,
            image_size=self.data_cfg.image_size,
        )
        if self.limit is not None:
            ds = ImageDataset(
                ds.images[: self.limit], ds.labels[: self.limit], ds.drange, ds.source
            )
        if split == "train" and not getattr(self, "_digits_plotted", False):
            # sample-digit grid on the first train load of a run
            # (reference util_mnist.plot_digits via get_public_dataset,
            # util_data.py:70/106 → mnist.png); failures never break a stage
            try:
                from gan_discovery_pso_tpu.analysis import reporting

                reporting.plot_digits(ds, self.run.general_dir / "mnist.png",
                                      seed=int(cfg_default(self.cfg, "seed", 42)))
                self._digits_plotted = True
            except Exception:
                pass
        return ds

    def batches(self, ds: ImageDataset, batch_size: int, drop_last: bool = True):
        """epoch_idx → iterator of (x, y) batches, deterministically keyed.

        drop_last=True is the torch-DataLoader-matching TRAIN default (fixed
        batch shapes → one compiled step). Pass drop_last=False for VAL/EVAL
        loops so the ragged tail is scored too — with drop_last a val set
        smaller than batch_size silently yields ZERO batches and every val
        metric becomes NaN."""

        def make(epoch: int):
            return epoch_batches(
                ds, batch_size, self.keys.peek(f"epoch_{epoch}"),
                drop_last=drop_last,
            )

        return make

    def metrics(self, name: str = "history", tensorboard: bool = False) -> MetricsWriter:
        # TB events under general/logs/ like the reference SummaryWriters
        # (util_dcgan.py:156-160, vq_vae.py:151)
        return MetricsWriter(self.run.reports_dir, name, tensorboard=tensorboard,
                             tb_dir=self.run.general_dir / "logs")

    def tee(self) -> Tee:
        return Tee(self.run.reports_dir / "log.txt")
