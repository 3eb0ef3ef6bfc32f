"""End-to-end Trainer loop on synthetic data: one epoch of training + eval
completes, checkpoints land in logdir, meters aggregate metrics."""

import os

import numpy as np

from semstereo_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from semstereo_tpu.data import SyntheticStereoDataset
from semstereo_tpu.train.trainer import Trainer


def test_trainer_one_epoch(tmp_path):
    cfg = TrainConfig(
        model=ModelConfig(
            maxdisp=16, topk=4, att_window1=(1, 2, 2), att_window2=(1, 2, 2)
        ),
        data=DataConfig(batch_size=2, test_batch_size=2, num_workers=1),
        optim=OptimConfig(epochs=1, lrepochs="12:2"),
        loss=LossConfig(use_seg=True, use_lrsc=True),
        logdir=str(tmp_path / "run"),
        save_freq=1,
    )
    train_ds = SyntheticStereoDataset(4, 32, 32, maxdisp=16, training=True)
    eval_ds = SyntheticStereoDataset(2, 32, 32, maxdisp=16, training=False)
    trainer = Trainer(cfg, train_dataset=train_ds, eval_dataset=eval_ds)
    state = trainer.train()
    assert state.epoch == 1
    # checkpoint written
    assert os.path.isdir(cfg.logdir)
    assert any(os.scandir(cfg.logdir))
    # eval metrics aggregated
    results = trainer.evaluate(0)
    for key in ("EPE", "D1", "loss", "PA", "mIoU"):
        assert key in results, (key, results.keys())
    assert np.isfinite(results["EPE"])
