"""Trainer: epoch loop, LR schedule, eval with meters, checkpoints, TB logs.

Replaces the reference train()/test() loops (/root/reference/main_us3d.py:128-182,
test_us3d.py:66-128) with a single driver over the jitted steps.  Batches are
device_put with a batch-axis sharding over the mesh's ``data`` axis, so the
same code runs 1-chip, 1-host-N-chip and multi-host.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from semstereo_tpu.config import TrainConfig
from semstereo_tpu.data import DataLoader, __datasets__
from semstereo_tpu.metrics import SegmentationMeter
from semstereo_tpu.parallel import make_mesh, shard_batch
from semstereo_tpu.train import checkpoint as ckpt
from semstereo_tpu.train.state import (
    TrainState,
    init_state,
    set_learning_rate,
)
from semstereo_tpu.train.steps import make_eval_step, make_train_step
from semstereo_tpu.utils import (
    AverageMeterDict,
    AverageMeterDictPerKey,
    save_scalars,
    tensor2float,
)

# Keys the jitted steps consume (everything else in a sample is metadata).
_TRAIN_KEYS = ("left", "right", "disparity", "disparity_4", "label")
_EVAL_KEYS = ("left", "right", "disparity", "label")
# Fixed universe of scalar keys make_eval_step can emit — the multi-host
# meter reduce sends dense arrays in this order so every process contributes
# an identical structure regardless of which keys its shard produced.
_EVAL_SCALAR_KEYS = (
    "disp_loss", "EPE", "D1", "Thres1", "Thres2", "Thres3", "label_loss", "loss",
)


def _seg_scalars(cm, num_classes: int) -> dict:
    """Seg metrics of ONE batch's confusion matrix (values may be NaN for
    classes absent from the batch; the per-key meter skips those) — the
    reference's per-batch aggregation unit (test_us3d.py:120-125)."""
    m = SegmentationMeter(num_classes)
    m.add_confusion(cm)
    cpa, iou = m.class_pixel_accuracy(), m.iou()
    return {
        "PA": float(m.pixel_accuracy()),
        "MPA": float(m.mean_pixel_accuracy()),
        "mIoU": float(m.mean_iou()),
        **{f"CPA{i}": float(cpa[i]) for i in range(len(cpa))},
        **{f"IoU{i}": float(iou[i]) for i in range(len(iou))},
    }


def _device_batch(mesh, batch, keys, spatial=False):
    sub = {k: batch[k] for k in keys if k in batch}
    return shard_batch(mesh, sub, spatial=spatial)


def _pad_eval_batch(batch, bs, maxdisp, ignore_index, invalidate_all=False):
    """Pad a ragged eval batch to `bs` rows so the jitted step sees one static
    shape that the data-axis sharding can always place (a B=3 final batch on a
    4-device data axis is unplaceable otherwise).  Padded rows repeat the last
    real sample for the images but carry ALL-INVALID ground truth — disparity
    = maxdisp (outside both the symmetric and positive valid ranges,
    steps.valid_mask) and label = ignore_index — so the masked metric
    reductions and the confusion matrix give them zero weight.  With
    ``invalidate_all`` every row is marked invalid (an alignment-only dummy
    batch for a host whose eval shard ran out first).  Returns
    (padded_batch, n_real_rows)."""
    b0 = next(v.shape[0] for v in batch.values() if not isinstance(v, list))
    real = 0 if invalidate_all else b0
    if b0 == bs and real == b0:
        return batch, real
    pad = bs - b0
    out = {}
    for k, v in batch.items():
        if isinstance(v, list):
            out[k] = list(v) + [v[-1]] * pad
        else:
            v = np.asarray(v)
            out[k] = (
                np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                if pad
                else v.copy()
            )
    for k, v in out.items():
        if isinstance(v, list):
            continue
        if k.startswith("disparity"):
            v[real:] = float(maxdisp)
        elif k.startswith("label"):
            v[real:] = float(ignore_index)
    return out, real


def reduce_eval_meters(meters, seg_meter, seg_batch_meter, num_classes: int):
    """All-reduce eval meters across processes, IN PLACE, over DENSE
    fixed-order arrays.  The NaN-skipping meters hold sparse dicts whose keys
    can differ per host (a class absent from one host's whole eval shard, a
    host that ran only alignment dummy batches, seg off) — and a pytree
    collective with per-host structures hangs or mis-pairs leaves (advisor
    r4).  A presence mask distinguishes "no host produced key k" from
    "reduced sum is legitimately 0.0"."""
    from semstereo_tpu.parallel import all_reduce_sum_tree

    seg_keys = (
        ["PA", "MPA", "mIoU"]
        + [f"CPA{i}" for i in range(num_classes)]
        + [f"IoU{i}" for i in range(num_classes)]
    )
    local = meters.data or {}
    dense = (
        np.array([local.get(k, 0.0) for k in _EVAL_SCALAR_KEYS], np.float64),
        np.array([1.0 if k in local else 0.0 for k in _EVAL_SCALAR_KEYS]),
        np.float64(meters.count),
        np.asarray(seg_meter.cm, np.float64),
        np.array([seg_batch_meter.sums.get(k, 0.0) for k in seg_keys], np.float64),
        np.array([seg_batch_meter.counts.get(k, 0) for k in seg_keys], np.float64),
    )
    sums, pres, count, seg_meter.cm, seg_sums, seg_counts = all_reduce_sum_tree(dense)
    meters.count = int(count)
    meters.data = {
        k: float(s) for k, s, p in zip(_EVAL_SCALAR_KEYS, sums, pres) if p > 0
    }
    seg_batch_meter.sums = {
        k: float(s) for k, s, c in zip(seg_keys, seg_sums, seg_counts) if c > 0
    }
    seg_batch_meter.counts = {
        k: int(c) for k, c in zip(seg_keys, seg_counts) if c > 0
    }


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        train_dataset=None,
        eval_dataset=None,
        writer=None,
        mesh=None,
    ):
        self.cfg = cfg
        if mesh is None:
            import math

            data = cfg.parallel.data
            if data == -1:
                # auto: the per-host batch must divide the data axis
                n_avail = len(jax.devices()) // (cfg.parallel.disp * cfg.parallel.space)
                data = math.gcd(n_avail, cfg.data.batch_size)
            mesh = make_mesh(data, cfg.parallel.disp, cfg.parallel.space)
        self.mesh = mesh
        self.writer = writer
        pidx, pcnt = jax.process_index(), jax.process_count()

        def build_dataset(list_file, training):
            ds_cls = __datasets__[cfg.data.dataset]
            kwargs = {}
            if cfg.data.crop_size is not None:
                import inspect

                if "crop_size" in inspect.signature(ds_cls.__init__).parameters:
                    kwargs["crop_size"] = cfg.data.crop_size
            return ds_cls(cfg.data.datapath, list_file, training, **kwargs)

        if train_dataset is None and cfg.data.trainlist and os.path.exists(cfg.data.trainlist):
            train_dataset = build_dataset(cfg.data.trainlist, True)
        if eval_dataset is None and cfg.data.testlist and os.path.exists(cfg.data.testlist):
            eval_dataset = build_dataset(cfg.data.testlist, False)

        self.train_loader = (
            DataLoader(
                train_dataset, cfg.data.batch_size, shuffle=True,
                num_workers=cfg.data.num_workers, drop_last=True, seed=cfg.seed,
                shard=(pidx, pcnt), prefetch=cfg.data.prefetch,
            )
            if train_dataset is not None
            else None
        )
        self.eval_loader = (
            DataLoader(
                eval_dataset, cfg.data.test_batch_size, shuffle=False,
                num_workers=cfg.data.num_workers, drop_last=False, seed=cfg.seed,
                shard=(pidx, pcnt), prefetch=cfg.data.prefetch,
            )
            if eval_dataset is not None
            else None
        )

        self.train_step = make_train_step(cfg)
        self.eval_step = make_eval_step(cfg)
        self.state: Optional[TrainState] = None
        self._dump_index = 0

    # -- state management ---------------------------------------------------
    def initialize(self, sample_shape=None) -> TrainState:
        if sample_shape is None:
            assert self.train_loader is not None
            first = next(iter(self.train_loader))
            sample_shape = first["left"].shape
        self.state = init_state(self.cfg, tuple(sample_shape))
        cfg = self.cfg
        if cfg.resume and ckpt.latest_epoch(cfg.logdir) is not None:
            self.state = ckpt.restore_checkpoint(cfg.logdir, self.state)
            print(f"resumed from {cfg.logdir} at epoch {self.state.epoch}")
        elif cfg.loadckpt:
            self.state, n = ckpt.restore_partial(cfg.loadckpt, self.state)
            print(f"partially loaded {n} tensors from {cfg.loadckpt}")
        return self.state

    # -- loops --------------------------------------------------------------
    def train(self):
        with jax.sharding.set_mesh(self.mesh):
            return self._train()

    def _train(self):
        cfg = self.cfg
        if self.state is None:
            self.initialize()
        os.makedirs(cfg.logdir, exist_ok=True)
        for epoch in range(int(self.state.epoch), cfg.optim.epochs):
            self.state = set_learning_rate(self.state, cfg, epoch)
            self.train_loader.set_epoch(epoch)
            for it, batch in enumerate(self.train_loader):
                t0 = time.time()
                dev_batch = _device_batch(self.mesh, batch, _TRAIN_KEYS, self.cfg.parallel.space > 1)
                self.state, scalars = self.train_step(self.state, dev_batch)
                step = epoch * len(self.train_loader) + it
                scalars = tensor2float(
                    {k: v for k, v in scalars.items() if np.ndim(v) == 0}
                )
                if self.writer and step % (cfg.summary_freq * 1000) == 0:
                    save_scalars(self.writer, "train", scalars, step)
                extra = "".join(
                    f", {tag} = {scalars[key]:.3f}"
                    for tag, key in (("seg", "label_loss"), ("lrsc", "lrsc_loss"))
                    if key in scalars
                )
                print(
                    f"Epoch {epoch}/{cfg.optim.epochs}, Iter {it}/{len(self.train_loader)}, "
                    f"loss = {scalars['loss']:.3f}, disp = {scalars['disp_loss']:.3f}"
                    f"{extra}, time = {time.time() - t0:.3f}"
                )
            if (epoch + 1) % cfg.save_freq == 0 and jax.process_index() == 0:
                ckpt.save_checkpoint(cfg.logdir, self.state, epoch)
            self.state = self.state.replace(epoch=epoch + 1)
            if self.eval_loader is not None:
                self._evaluate(epoch)
        return self.state

    def evaluate(self, epoch: int = 0, save_dir: Optional[str] = None) -> dict:
        with jax.sharding.set_mesh(self.mesh):
            return self._evaluate(epoch, save_dir=save_dir)

    def _template_batch(self) -> dict:
        """A one-sample batch for alignment-only dummy eval steps on a host
        whose eval shard is empty/short (its contents are marked invalid
        before use)."""
        ds = self.eval_loader.dataset
        from semstereo_tpu.data.loader import collate

        s = ds.get(0, np.random.default_rng(0)) if hasattr(ds, "get") else ds[0]
        return collate([s])

    def _n_eval_steps(self) -> int:
        """Number of jitted eval steps EVERY process must run.  Multi-host,
        the loader shards the list round-robin (idx[pidx::pcnt]) so shard 0
        is always the longest; hosts with shorter shards run alignment-only
        dummy batches so the collective programs stay in step."""
        if jax.process_count() == 1:
            return len(self.eval_loader)
        n = len(self.eval_loader.dataset)
        bs = self.eval_loader.batch_size
        longest_shard = -(-n // jax.process_count())
        return -(-longest_shard // bs)

    def _evaluate(self, epoch: int = 0, save_dir: Optional[str] = None) -> dict:
        cfg = self.cfg
        meters = AverageMeterDict()
        seg_meter = SegmentationMeter(cfg.model.num_classes - 1)
        # Reference-parity mode: average PER-BATCH metric values through
        # NaN-aware meters (test_us3d.py:120-125) instead of deriving from
        # the global confusion matrix — PARITY.md §2.7 item 7.
        per_batch = cfg.eval_seg_per_batch
        seg_batch_meter = AverageMeterDictPerKey()
        bs = self.eval_loader.batch_size
        n_steps = self._n_eval_steps()
        loader_it = iter(self.eval_loader)
        last_raw = None
        for it in range(n_steps):
            raw = next(loader_it, None)
            if raw is None:  # this host's shard ran out: alignment-only step
                template = last_raw if last_raw is not None else self._template_batch()
                batch, real = _pad_eval_batch(
                    template, bs, cfg.model.maxdisp, cfg.loss.ignore_index,
                    invalidate_all=True,
                )
            else:
                last_raw = raw
                batch, real = _pad_eval_batch(
                    raw, bs, cfg.model.maxdisp, cfg.loss.ignore_index
                )
            dev_batch = _device_batch(self.mesh, batch, _EVAL_KEYS, self.cfg.parallel.space > 1)
            scalars = self.eval_step(self.state, dev_batch)
            cm = scalars.pop("confusion", None)
            disp_est = scalars.pop("disp_est", None)
            label_est = scalars.pop("label_est", None)
            if save_dir and real > 0 and disp_est is not None:
                self._save_outputs(
                    save_dir, batch, np.asarray(disp_est)[:real],
                    None if label_est is None else np.asarray(label_est)[:real],
                )
            if real == 0:
                continue  # dummy batch: nothing to meter
            if cm is not None:
                if per_batch:
                    seg_batch_meter.update(_seg_scalars(cm, cfg.model.num_classes - 1))
                else:
                    seg_meter.add_confusion(cm)
            if self.writer and it % cfg.summary_freq == 0 and disp_est is not None:
                self._log_images(epoch, batch, np.asarray(disp_est))
            meters.update(tensor2float(scalars))
        # Multi-host eval: each process sees a disjoint shard of the test list
        # (loader shard=(pidx, pcnt)), so meter sums/counts and the confusion
        # matrix must be all-reduced — the analog of the reference's
        # reduce_scalar_outputs (utils/experiment.py:231-258).
        if jax.process_count() > 1:
            reduce_eval_meters(
                meters, seg_meter, seg_batch_meter, cfg.model.num_classes - 1
            )
        results = meters.mean()
        if per_batch:
            results.update(seg_batch_meter.mean())
        elif seg_meter.cm.sum() > 0:
            results.update(
                PA=seg_meter.pixel_accuracy(),
                MPA=seg_meter.mean_pixel_accuracy(),
                mIoU=seg_meter.mean_iou(),
            )
            per_key = AverageMeterDictPerKey()
            cpa, iou = seg_meter.class_pixel_accuracy(), seg_meter.iou()
            per_key.update(
                {
                    **{f"CPA{i}": float(cpa[i]) for i in range(len(cpa))},
                    **{f"IoU{i}": float(iou[i]) for i in range(len(iou))},
                }
            )
            results.update(per_key.mean())
        if self.writer:
            save_scalars(self.writer, "fulltest", results, epoch)
        print("avg_test_scalars", results)
        return results

    def _log_images(self, epoch: int, batch: dict, disp_est: np.ndarray):
        """TensorBoard image panel: input, est/gt disparity, KITTI error map
        (reference main_us3d.py:252-268)."""
        from semstereo_tpu.utils import disp_error_image, save_images

        images = {
            "imgL": batch["left"][..., 0],
            "disp_est": disp_est,
        }
        if "disparity" in batch:
            images["disp_gt"] = batch["disparity"]
            images["errormap"] = np.transpose(
                disp_error_image(disp_est, batch["disparity"]), (0, 3, 1, 2)
            )[:, 0]
        save_images(self.writer, "test", images, epoch)

    def _save_outputs(self, save_dir, batch, disp_est, label_est=None):
        """Submission-style dump: one 256×uint16 disparity PNG (the KITTI
        encoding, reference datasets/data_io.py convention) per input, named
        by the sample's left_filename (falling back to a running index), plus
        a uint8 label PNG when segmentation ran.  This is the no-ground-truth
        evaluator use the reference's dataset layer supports
        (kitti_dataset_15.py:123-150)."""
        from PIL import Image

        os.makedirs(save_dir, exist_ok=True)
        names = batch.get("left_filename")
        for i in range(disp_est.shape[0]):
            if names is not None:
                stem = os.path.splitext(os.path.basename(names[i]))[0]
            else:
                stem = f"{self._dump_index:06d}"
                self._dump_index += 1
            d = np.clip(disp_est[i] * 256.0, 0, 65535).astype(np.uint16)
            Image.fromarray(d).save(os.path.join(save_dir, f"{stem}_disp.png"))
            if label_est is not None:
                Image.fromarray(label_est[i].astype(np.uint8)).save(
                    os.path.join(save_dir, f"{stem}_label.png")
                )
