"""Typed configuration system with per-recipe presets.

Replaces the reference's three duplicated argparse blocks
(/root/reference/main_us3d.py:51-81, main_whu.py:48-73, test_us3d.py:29-48)
— including their string-typed boolean flags (SURVEY.md section 2.7 item 1)
— with real dataclasses.  Presets cover the full training matrix:
us3d_stage1/2, whu_stage1/2 (strict stereo-only parity), whu_lrsc_stage1/2
(the README-intended LRSC self-supervised recipe), sceneflow, kitti,
cityscapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str = "SemStereo"  # registry key: SemStereo | SemStereo_WHU
    maxdisp: int = 64
    num_classes: int = 6
    att_weights_only: bool = False
    seg_if: bool = True
    stereo_if: bool = True
    topk: int = 24
    refine_topk: int = 2
    cost_volume_impl: str = "auto"  # auto (=xla; see ops/cost_volume.py) | xla | pallas
    att_window1: Tuple[int, int, int] = (4, 4, 4)
    att_window2: Tuple[int, int, int] = (6, 4, 4)
    shard_disp: bool = False  # shard cost-volume disparity planes over mesh 'disp'
    shard_spatial: bool = False  # shard height tiles over mesh 'space'
    # Remat policy: False/"none" | True/"full" (backbone+hourglasses) | a
    # comma-set of {backbone, featup, hourglass, concat, spx} for targeted
    # activation-memory relief (models/semstereo.py _remat_components)
    remat: bool | str = False
    # Path to a torch mobilevitv2_100 state_dict (.pth); loaded into the
    # backbone at init with a loud leaf-complete contract (utils/timm_convert).
    # None = train the backbone from scratch (no network egress here).
    pretrained_backbone: str | None = None

    @property
    def symmetric(self) -> bool:
        return self.name != "SemStereo_WHU"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "us3d"  # registry key
    datapath: str = "data/us3d/JAX"
    trainlist: str = "data/us3d/JAX/train.txt"
    testlist: str = "data/us3d/JAX/test.txt"
    batch_size: int = 4
    test_batch_size: int = 4
    num_workers: int = 4
    prefetch: int = 2
    crop_size: Optional[Tuple[int, int]] = None  # (H, W) train crop, dataset-specific
    # Valid-disparity mask convention (drives both train loss and eval
    # metrics): 'symmetric'  -> -maxdisp <= d < maxdisp (US3D, large-negative
    #                           invalid sentinel; reference main_us3d.py:199)
    #           'positive'   -> 0 < d < maxdisp (WHU main_whu.py:198; also
    #                           KITTI-convention disp PNGs where 0 = no gt,
    #                           reference kitti_dataset_15.py:37-40)
    #           'auto'       -> symmetric for the us3d dataset, else positive
    mask_policy: str = "auto"

    def resolved_mask_policy(self, symmetric_model: bool) -> str:
        if self.mask_policy != "auto":
            return self.mask_policy
        return "symmetric" if (symmetric_model and self.dataset == "us3d") else "positive"


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    epochs: int = 48
    # "12,22,30,38,44:2" => divide lr by 2 at each listed epoch (cumulative)
    lrepochs: str = "12,22,30,38,44:2"
    # Gradient accumulation: split each batch into N microbatches scanned
    # sequentially (mean gradient, one optimizer update).  Trades step latency
    # for activation memory — lets maxdisp-128 full-res configs train with the
    # reference's global batch on fewer chips.
    grad_accum: int = 1
    # Global-norm gradient clip; 0 disables (reference parity).  Useful in
    # practice: the cosine cost-volume eps (1e-5, submodule.py:219) lets
    # gradients through dead-ReLU feature groups spike to ~1/eps at early
    # steps, and a clip bounds those without changing steady-state training.
    grad_clip: float = 0.0


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    data: int = -1  # -1: all devices on the data axis
    disp: int = 1  # disparity-plane/model axis size (volume sharding)
    space: int = 1  # spatial-tile axis size (height sharding + GSPMD halo exchange)
    # Under pjit/GSPMD, BN batch stats are global (sync-BN) by construction.
    # This flag is recorded for the shard_map path where per-replica stats
    # (reference nn.DataParallel semantics) are possible.
    sync_bn: bool = True


@dataclasses.dataclass(frozen=True)
class LossConfig:
    use_seg: bool = True  # supervised label loss on the left head
    use_lrsc: bool = True  # LRSC CE on the right head (GT left labels)
    use_lrsc_self: bool = False  # LRSC with *predicted* left labels (WHU README recipe)
    ignore_index: int = 5


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    optim: OptimConfig = OptimConfig()
    parallel: ParallelConfig = ParallelConfig()
    loss: LossConfig = LossConfig()
    seed: int = 1
    logdir: str = "checkpoints/run"
    loadckpt: str = ""  # partial warm-start (stage-1 -> stage-2)
    resume: bool = False
    summary_freq: int = 50
    save_freq: int = 4  # epochs between checkpoints
    compute_dtype: str = "float32"  # float32 | bfloat16 (model compute)
    # Seg-metric aggregation: False (default) derives PA/MPA/mIoU from ONE
    # global confusion matrix over the eval set (the standard definition);
    # True reproduces the reference's per-batch metric averaging through
    # NaN-aware meters (test_us3d.py:120-125) for strict log comparison —
    # see PARITY.md §2.7 item 7.
    eval_seg_per_batch: bool = False

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


def _us3d(stage1: bool) -> TrainConfig:
    return TrainConfig(
        model=ModelConfig(name="SemStereo", maxdisp=64, att_weights_only=stage1),
        data=DataConfig(dataset="us3d"),
        loss=LossConfig(use_seg=True, use_lrsc=True),
        logdir="checkpoints/us3d_stage1" if stage1 else "checkpoints/us3d_stage2",
    )


def _whu(stage1: bool, lrsc_self: bool) -> TrainConfig:
    tag = "whu_lrsc" if lrsc_self else "whu"
    return TrainConfig(
        model=ModelConfig(
            name="SemStereo_WHU", maxdisp=128, att_weights_only=stage1,
            seg_if=True, stereo_if=True,
        ),
        data=DataConfig(
            dataset="WhuDataset", datapath="data/whu",
            trainlist="data/whu/train.txt", testlist="data/whu/test.txt",
        ),
        loss=LossConfig(use_seg=False, use_lrsc=False, use_lrsc_self=lrsc_self),
        logdir=f"checkpoints/{tag}_stage{1 if stage1 else 2}",
    )


def _sceneflow() -> TrainConfig:
    return TrainConfig(
        model=ModelConfig(name="SemStereo", maxdisp=64, seg_if=True, stereo_if=True),
        data=DataConfig(
            dataset="sceneflow", datapath="data/sceneflow",
            trainlist="filenames/sceneflow_train.txt",
            testlist="filenames/sceneflow_test.txt",
            crop_size=(256, 512),
        ),
        loss=LossConfig(use_seg=False, use_lrsc=False),
        logdir="checkpoints/sceneflow",
    )


def _kitti() -> TrainConfig:
    """KITTI-2015 with semantic labels (reference datasets/kitti_dataset_15.py:
    512x256 lower-biased crop, 19-class map)."""
    return TrainConfig(
        # num_classes counts the ignore class (last), mirroring the US3D 6/5
        # convention: 19 train-ids + ignore 19 -> 20-way heads, dice drops last.
        model=ModelConfig(name="SemStereo", maxdisp=64, num_classes=20),
        data=DataConfig(
            dataset="kitti", datapath="data/kitti",
            trainlist="filenames/kitti15_train.txt",
            testlist="filenames/kitti15_val.txt",
            crop_size=(256, 512),
        ),
        # the 34->19 label map emits train-id 19 for ignore (datasets.py:26-41)
        loss=LossConfig(use_seg=True, use_lrsc=True, ignore_index=19),
        logdir="checkpoints/kitti",
    )


def _cityscapes() -> TrainConfig:
    """Cityscapes stereo+semantics (reference datasets/cityscapes_dataset_c.py,
    incl. RandomVdisp vertical-disparity augmentation)."""
    return TrainConfig(
        model=ModelConfig(name="SemStereo", maxdisp=64, num_classes=20),
        data=DataConfig(
            dataset="cityscapes", datapath="data/cityscapes",
            trainlist="filenames/cityscapes_train.txt",
            testlist="filenames/cityscapes_val.txt",
            crop_size=(256, 512),
        ),
        loss=LossConfig(use_seg=True, use_lrsc=True, ignore_index=19),
        logdir="checkpoints/cityscapes",
    )


PRESETS = {
    "us3d_stage1": _us3d(True),
    "us3d_stage2": _us3d(False),
    "whu_stage1": _whu(True, False),
    "whu_stage2": _whu(False, False),
    "whu_lrsc_stage1": _whu(True, True),
    "whu_lrsc_stage2": _whu(False, True),
    "sceneflow": _sceneflow(),
    "kitti": _kitti(),
    "cityscapes": _cityscapes(),
}


def parse_lrepochs(spec: str) -> tuple[list[int], float]:
    """Parse "12,22,30,38,44:2" -> ([12,22,30,38,44], 2.0)
    (reference adjust_learning_rate, utils/experiment.py:102-120)."""
    epochs_str, rate_str = spec.split(":")
    return [int(e) for e in epochs_str.split(",")], float(rate_str)


def lr_for_epoch(base_lr: float, epoch: int, spec: str) -> float:
    downs, rate = parse_lrepochs(spec)
    lr = base_lr
    for e in downs:
        if epoch >= e:
            lr /= rate
        else:
            break
    return lr
