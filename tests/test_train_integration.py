"""Integration: tiny-config training on synthetic stereo pairs — loss
decreases, checkpoint save/restore roundtrips, stage-1 -> stage-2 partial
restore works, and the 8-device data-parallel step matches single-device
(SURVEY.md section 4 items 4-5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semstereo_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    lr_for_epoch,
)
from semstereo_tpu.data import DataLoader, SyntheticStereoDataset
from semstereo_tpu.parallel import make_mesh, shard_batch
from semstereo_tpu.train import checkpoint as ckpt
from semstereo_tpu.train import init_state, make_eval_step, make_train_step, set_learning_rate

TINY_MODEL = ModelConfig(
    maxdisp=16, topk=4, att_window1=(1, 2, 2), att_window2=(1, 2, 2)
)
TINY = TrainConfig(
    model=TINY_MODEL,
    data=DataConfig(batch_size=2),
    optim=OptimConfig(lr=1e-3),
    loss=LossConfig(use_seg=True, use_lrsc=True),
)
H = W = 32


def make_batch(bs=2):
    ds = SyntheticStereoDataset(bs, H, W, maxdisp=16, training=True)
    loader = DataLoader(ds, bs, shuffle=False, num_workers=1)
    return next(iter(loader))


def to_dev(batch):
    return {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}


def clone_state(state):
    """Deep-copy device buffers: train_step donates its input state, so tests
    sharing the module-scoped fixture must hand it a private copy."""
    return jax.tree_util.tree_map(lambda x: jnp.array(x), state)


@pytest.fixture(scope="module")
def tiny_state():
    return init_state(TINY, (2, H, W, 3))


def test_loss_decreases(tiny_state):
    step = make_train_step(TINY)
    state = clone_state(tiny_state)
    batch = to_dev(make_batch())
    losses = []
    for _ in range(8):
        state, scalars = step(state, batch)
        losses.append(float(scalars["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_eval_step_runs(tiny_state):
    eval_step = make_eval_step(TINY)
    batch = to_dev(make_batch())
    scalars = eval_step(tiny_state, batch)
    for k in ("loss", "disp_loss", "EPE", "D1", "Thres1"):
        assert np.isfinite(float(scalars[k])), k
    assert scalars["confusion"].shape == (5, 5)


def test_lr_schedule_parsing():
    assert lr_for_epoch(1e-3, 0, "12,22:2") == 1e-3
    assert lr_for_epoch(1e-3, 12, "12,22:2") == 5e-4
    assert lr_for_epoch(1e-3, 30, "12,22:2") == 2.5e-4


def test_set_learning_rate(tiny_state):
    state = set_learning_rate(tiny_state, TINY, epoch=22)
    assert float(state.opt_state.hyperparams["learning_rate"]) == pytest.approx(
        1e-3 / 4
    )


def test_checkpoint_roundtrip(tmp_path, tiny_state):
    logdir = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(logdir, tiny_state, epoch=3)
    assert ckpt.latest_epoch(logdir) == 3
    blank = init_state(TINY.replace(seed=99), (2, H, W, 3))
    restored = ckpt.restore_checkpoint(logdir, blank)
    assert restored.epoch == 4
    p0 = jax.tree_util.tree_leaves(tiny_state.params)
    p1 = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(p0, p1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage1_to_stage2_partial_restore(tmp_path):
    stage1 = TINY.replace(model=TINY_MODEL.__class__(**{**TINY_MODEL.__dict__, "att_weights_only": True}))
    s1 = init_state(stage1, (2, H, W, 3))
    logdir = str(tmp_path / "stage1")
    ckpt.save_checkpoint(logdir, s1, epoch=47)
    s2 = init_state(TINY, (2, H, W, 3))
    merged, n = ckpt.restore_partial(logdir, s2)
    assert n > 0
    # a stage-1 param must now equal the checkpointed value
    a = np.asarray(s1.params["feature"]["stem"]["conv"]["kernel"])
    b = np.asarray(merged.params["feature"]["stem"]["conv"]["kernel"])
    np.testing.assert_array_equal(a, b)
    # stage-2-only params (refinement hourglass) must remain from fresh init
    assert "hourglass" in merged.params


def test_bf16_remat_train_step(tiny_state):
    """Mixed-precision (bf16 compute) + remat step: loss finite and close to
    the fp32 step; master params/batch-stats remain fp32 after the update."""
    cfg = TINY.replace(
        model=TINY_MODEL.__class__(**{**TINY_MODEL.__dict__, "remat": True}),
        compute_dtype="bfloat16",
    )
    step = make_train_step(cfg)
    batch = to_dev(make_batch())
    state, scalars = step(clone_state(tiny_state), batch)
    assert np.isfinite(float(scalars["loss"]))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.batch_stats):
        assert leaf.dtype == jnp.float32

    fp32_step = make_train_step(TINY)
    _, scal32 = fp32_step(clone_state(tiny_state), batch)
    # Untrained net on random data: bf16 rounding amplifies through the
    # softmax/soft-argmin stages, so only loose agreement is meaningful here.
    np.testing.assert_allclose(
        float(scalars["loss"]), float(scal32["loss"]), rtol=0.12
    )


@pytest.mark.skipif(
    os.environ.get("SEMSTEREO_SLOW_TESTS") != "1",
    reason="200-step loss-curve A/B is tens of minutes on the 2-vCPU host; "
    "set SEMSTEREO_SLOW_TESTS=1 (the committed TPU record lives in "
    "benchmarks/results_r5.json:convergence.bf16_vs_fp32)",
)
def test_bf16_fp32_loss_curve_200steps():
    """bf16 (the flagship compute dtype) must TRAIN like fp32, not just match
    one step loosely: same seeded fp32 master init, same batches, 200 steps —
    the final-10-step mean losses must agree within 10% and both curves must
    have decreased >5x (VERDICT r4 weak #7; the reference trains fp32,
    main_us3d.py:98-102, so bf16 carries the burden of proof).

    200 steps, not 50: the committed TPU record shows bf16 lags early
    (ratio 1.42 at step 50 — cost-volume cosine eps noise amplifies bf16
    rounding at random init) and fully converges to fp32 by step 200
    (ratio 0.95, results_r5.json)."""
    from semstereo_tpu.data import DataLoader

    ds = SyntheticStereoDataset(8, H, W, maxdisp=16, training=True)
    loader = DataLoader(ds, 2, shuffle=False, num_workers=2)
    batches = [to_dev(b) for b in loader]
    tails = {}
    first = {}
    for dt in ("float32", "bfloat16"):
        cfg = TINY.replace(compute_dtype=dt)
        state = init_state(cfg, (2, H, W, 3))
        step = make_train_step(cfg)
        curve = []
        for i in range(200):
            state, scalars = step(state, batches[i % len(batches)])
            curve.append(float(scalars["loss"]))
        assert np.isfinite(curve).all(), dt
        tails[dt] = float(np.mean(curve[-10:]))
        first[dt] = curve[0]
    assert abs(tails["bfloat16"] / tails["float32"] - 1.0) < 0.10, tails
    for dt in tails:
        assert tails[dt] < 0.2 * first[dt], (dt, first[dt], tails[dt])


def test_grad_accum_matches_single_step(tiny_state):
    """grad_accum=2: (a) the accumulated gradient is the mean of the
    per-microbatch gradients — verified as the exact identity
    ``gacc([A,B]) == (gacc([A,A]) + gacc([B,B])) / 2`` where every term comes
    from the SAME compiled scan (iteration slots share one executable, so the
    per-micrograd float ops are bitwise-identical across calls) — and (b) the
    reported loss/EPE match the one-shot step.

    The micrograds are deliberately NOT compared against a separately-jitted
    single-batch grad fn: micrograds are bitwise independent of the carried BN
    running stats (train-mode BN normalizes with batch stats — verified), but
    the reference's cosine cost-volume eps (1e-5) amplifies mere
    compilation-path reassociation noise by ~1/eps through dead-ReLU feature
    groups at random init, which would swamp any element-wise tolerance."""
    from semstereo_tpu.train.steps import make_grads_fn

    batch = to_dev(make_batch(bs=4))
    cfgA = TINY.replace(optim=OptimConfig(lr=1e-3, grad_accum=2))
    gradsA = jax.jit(make_grads_fn(cfgA))

    def dup(mb):
        return {k: jnp.concatenate([v, v], axis=0) for k, v in mb.items()}

    s = tiny_state
    mb1 = {k: v[:2] for k, v in batch.items()}
    mb2 = {k: v[2:] for k, v in batch.items()}
    gacc, (bsA, auxA, _, _) = gradsA(s.params, s.batch_stats, batch)
    gA, _ = gradsA(s.params, s.batch_stats, dup(mb1))  # == micrograd(A)
    gB, _ = gradsA(s.params, s.batch_stats, dup(mb2))  # == micrograd(B)
    for (path, ga), ea, eb in zip(
        jax.tree_util.tree_leaves_with_path(gacc),
        jax.tree_util.tree_leaves(gA),
        jax.tree_util.tree_leaves(gB),
        strict=True,
    ):
        mean = (np.asarray(ea) + np.asarray(eb)) / 2
        np.testing.assert_allclose(
            np.asarray(ga), mean, rtol=1e-6, atol=1e-7 * max(np.abs(mean).max(), 1.0),
            err_msg=jax.tree_util.keystr(path),
        )

    # loss/metric reporting agrees with the one-shot step (masked means over
    # fully-valid synthetic samples => mean of microbatch means == global mean)
    step1 = make_train_step(TINY)
    stepA = make_train_step(cfgA)
    _, scal1 = step1(clone_state(tiny_state), batch)
    _, scalA = stepA(clone_state(tiny_state), batch)
    np.testing.assert_allclose(float(scal1["loss"]), float(scalA["loss"]), rtol=0.05)
    np.testing.assert_allclose(float(scal1["EPE"]), float(scalA["EPE"]), rtol=0.05)


def test_grad_clip_bounds_update(tiny_state):
    """grad_clip chains clip_by_global_norm before Adam; the epoch-LR setter
    must still find the injected hyperparams inside the chain tuple."""
    from semstereo_tpu.train.state import init_state as _init

    cfg = TINY.replace(optim=OptimConfig(lr=1e-3, grad_clip=1.0))
    state = _init(cfg, (2, H, W, 3))
    step = make_train_step(cfg)
    batch = to_dev(make_batch())
    new_state, scalars = step(clone_state(state), batch)
    assert np.isfinite(float(scalars["loss"]))
    # clipped grads => Adam's first update magnitude is <= lr everywhere
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        assert float(jnp.max(jnp.abs(a - b))) <= 1.1e-3
    # epoch-LR setter reaches the hyperparams nested inside the chain tuple
    state2 = set_learning_rate(new_state, cfg, epoch=22)
    lrs = [
        float(s.hyperparams["learning_rate"])
        for s in (state2.opt_state if isinstance(state2.opt_state, tuple) else (state2.opt_state,))
        if hasattr(s, "hyperparams")
    ]
    assert lrs and lrs[0] == pytest.approx(1e-3 / 4)


def test_data_parallel_matches_single_device(tiny_state):
    """Batch sharded over the 8-device CPU mesh must produce the same loss
    and updated params as unsharded execution."""
    assert jax.device_count() >= 8
    step = make_train_step(TINY)
    batch8 = to_dev(make_batch(bs=8))

    _, scal_single = step(clone_state(tiny_state), batch8)

    mesh = make_mesh()
    sharded = shard_batch(mesh, batch8)
    state_new, scal_sharded = step(clone_state(tiny_state), sharded)

    np.testing.assert_allclose(
        float(scal_single["loss"]), float(scal_sharded["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(scal_single["EPE"]), float(scal_sharded["EPE"]), rtol=2e-4
    )


def test_spatial_sharding_matches_single_device(tiny_state):
    """data=2 x space=4 mesh (height tiles + GSPMD conv halo exchange) must
    match unsharded execution.

    Tolerances: the segmentation path is continuous, so it must agree to
    float-reassociation noise.  The disparity path passes att_weights through
    a DISCRETE lax.top_k plane selection — sharded-conv reassociation (~1e-7)
    flips near-ties there, which the refinement amplifies; a ~1% loss band is
    the correct expectation, not a sharding bug (verified by elementwise
    comparison: all pre-top-k intermediates agree to <1e-6)."""
    assert jax.device_count() >= 8
    from semstereo_tpu.config import ParallelConfig

    batch8 = to_dev(make_batch(bs=2))
    step_plain = make_train_step(TINY)
    _, scal_single = step_plain(clone_state(tiny_state), batch8)

    cfg = TINY.replace(parallel=ParallelConfig(data=2, space=4))
    mesh = make_mesh(data=2, disp=1, space=4)
    sharded = shard_batch(mesh, batch8, spatial=True)
    step = make_train_step(cfg)
    with jax.sharding.set_mesh(mesh):
        _, scal_sharded = step(clone_state(tiny_state), sharded)

    np.testing.assert_allclose(
        float(scal_single["label_loss"]), float(scal_sharded["label_loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(scal_single["loss"]), float(scal_sharded["loss"]), rtol=1.5e-2
    )


def test_disp_sharding_matches_single_device(tiny_state):
    """data=2 x disp=2 x space=2 mesh — the cost-volume tensor-parallel axis
    (disparity planes, semstereo.py _constrain_disp) composed with the other
    two axes — must match unsharded execution.

    Same tolerance rationale as the spatial test above: the continuous
    segmentation path must agree to reassociation noise; the disparity path
    crosses a discrete lax.top_k plane selection whose near-ties can flip
    under sharded-reduction reassociation, so the total loss gets a ~1%
    band.  A wrong psum placement would produce an O(1) loss difference,
    far outside these bands."""
    assert jax.device_count() >= 8
    from semstereo_tpu.config import ParallelConfig

    batch8 = to_dev(make_batch(bs=2))
    step_plain = make_train_step(TINY)
    _, scal_single = step_plain(clone_state(tiny_state), batch8)

    cfg = TINY.replace(parallel=ParallelConfig(data=2, disp=2, space=2))
    mesh = make_mesh(data=2, disp=2, space=2)
    sharded = shard_batch(mesh, batch8, spatial=True)
    step = make_train_step(cfg)
    with jax.sharding.set_mesh(mesh):
        _, scal_sharded = step(clone_state(tiny_state), sharded)

    np.testing.assert_allclose(
        float(scal_single["label_loss"]), float(scal_sharded["label_loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(scal_single["loss"]), float(scal_sharded["loss"]), rtol=1.5e-2
    )
