"""Training engine tests: loss factory parity, train-step mechanics, tiny
end-to-end training runs for both model families."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adsr_tpu.core.config import (
    DataConfig, DRCTModelConfig, DRNModelConfig, Experiment, OptimConfig,
)
from adsr_tpu.data.pipeline import SRDataset
from adsr_tpu.train.losses import make_loss, parse_loss_spec
from adsr_tpu.train.trainer import Trainer, cosine_lr, make_train_step


class TestLosses:
    def test_parse(self):
        assert parse_loss_spec("1*L1") == [(1.0, "L1")]
        assert parse_loss_spec("0.5*L1+2*MSE") == [(0.5, "L1"), (2.0, "MSE")]
        with pytest.raises(ValueError):
            parse_loss_spec("1*BAD")

    def test_l1_mse_values(self):
        sr = jnp.full((1, 4, 4, 1), 2.0)
        hr = jnp.zeros((1, 4, 4, 1))
        loss = make_loss("1*L1")
        total, comps = loss(sr, hr)
        assert float(total) == pytest.approx(2.0)
        loss = make_loss("1*MSE")
        assert float(loss(sr, hr)[0]) == pytest.approx(4.0)

    def test_psnr_loss_sign(self):
        # reference PSNRLoss returns NEGATIVE psnr (loss.py:63-70)
        sr = jnp.full((1, 4, 4, 1), 10.0)
        hr = jnp.zeros((1, 4, 4, 1))
        val = float(make_loss("1*PSNR")(sr, hr)[0])
        want = -10 * np.log10(255 ** 2 / (100 + 1e-8))
        assert val == pytest.approx(want, rel=1e-5)

    def test_ssim_loss_runs(self):
        rng = np.random.RandomState(0)
        sr = jnp.asarray(rng.rand(2, 32, 32, 1) * 255, jnp.float32)
        hr = jnp.asarray(rng.rand(2, 32, 32, 1) * 255, jnp.float32)
        val = float(make_loss("1*SSIM", batch_size=2, scale=4)(sr, hr)[0])
        assert val > 0  # random images are dissimilar

    def test_composite(self):
        sr = jnp.full((1, 4, 4, 1), 2.0)
        hr = jnp.zeros((1, 4, 4, 1))
        total, comps = make_loss("1*L1+0.5*MSE")(sr, hr)
        assert float(total) == pytest.approx(2.0 + 0.5 * 4.0)
        assert set(comps) == {"L1", "MSE"}


class TestSchedule:
    def test_cosine_endpoints(self):
        assert cosine_lr(0, 1e-4, 1e-7, 10) == pytest.approx(1e-4)
        assert cosine_lr(10, 1e-4, 1e-7, 10) == pytest.approx(1e-7)
        mid = cosine_lr(5, 1e-4, 1e-7, 10)
        assert mid == pytest.approx((1e-4 + 1e-7) / 2, rel=1e-6)


def tiny_drct_exp(**kw):
    model = DRCTModelConfig(upscale=2, img_size=8, window_size=4, in_chans=1,
                            embed_dim=12, num_layers=1, num_heads=2, gc=4)
    data = DataConfig(resolution=16, patch_size=16, scale=(2,), n_colors=1,
                      batch_size=2, test_every=2)
    optim = OptimConfig(lr=1e-3, epochs=kw.pop("epochs", 2))
    return Experiment(model=model, data=data, optim=optim, save="/tmp/t",
                      precision="fp32", print_every=100, **kw)


def tiny_drn_exp(**kw):
    model = DRNModelConfig(scale=(2, 4), n_blocks=1, n_feats=8, n_colors=1)
    data = DataConfig(resolution=16, patch_size=16, scale=(2, 4), n_colors=1,
                      batch_size=2, test_every=2)
    optim = OptimConfig(lr=1e-3, epochs=kw.pop("epochs", 2))
    return Experiment(model=model, data=data, optim=optim, save="/tmp/t",
                      precision="fp32", print_every=100, **kw)


def synthetic_sr_dataset(n, hr_size, scales_desc, seed=0):
    """Downsample-consistent random dataset (block-average LR)."""
    rng = np.random.RandomState(seed)
    hr = (rng.rand(n, hr_size, hr_size, 1) * 255).astype(np.float32)
    lrs = []
    for s in scales_desc:
        m = hr_size // s
        lrs.append(hr.reshape(n, m, s, m, s, 1).mean(axis=(2, 4)))
    return SRDataset(hr=hr, lrs=lrs, scales_desc=tuple(scales_desc),
                     filenames=[f"{i:03d}" for i in range(n)])


class TestTrainStep:
    def test_drct_step_updates_params(self):
        exp = tiny_drct_exp()
        step, init_state, _ = make_train_step(exp)
        state = init_state(jax.random.key(0))
        ds = synthetic_sr_dataset(4, 16, (2,))
        lrs = [jnp.asarray(l[:2]) for l in ds.lrs]
        hr = jnp.asarray(ds.hr[:2])
        before = jax.tree_util.tree_leaves(state.params)[0].copy()
        state, metrics = step(state, lrs, hr, 1e-3, jax.random.key(1))
        assert int(state.step) == 1
        assert np.isfinite(float(metrics["total"]))
        after = jax.tree_util.tree_leaves(state.params)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_drn_dual_step(self):
        exp = tiny_drn_exp()
        step, init_state, _ = make_train_step(exp)
        state = init_state(jax.random.key(0))
        assert "duals" in state.params and len(state.params["duals"]) == 2
        ds = synthetic_sr_dataset(4, 16, (4, 2))
        lrs = [jnp.asarray(l[:2]) for l in ds.lrs]
        hr = jnp.asarray(ds.hr[:2])
        state, metrics = step(state, lrs, hr, 1e-3, jax.random.key(1))
        assert {"total", "primary", "dual"} <= set(metrics)
        assert np.isfinite(float(metrics["total"]))

    def test_drct_loss_decreases(self):
        exp = tiny_drct_exp(epochs=5)
        tr = Trainer(exp, synthetic_sr_dataset(4, 16, (2,)),
                     synthetic_sr_dataset(2, 16, (2,), seed=1))
        first = tr.train_one_epoch()["total"]
        for _ in range(4):
            last = tr.train_one_epoch()["total"]
        assert tr.terminate()
        assert last < first

    def test_trainer_test_metrics(self):
        exp = tiny_drct_exp()
        tr = Trainer(exp, synthetic_sr_dataset(4, 16, (2,)),
                     synthetic_sr_dataset(2, 16, (2,), seed=1))
        p, s = tr.test()
        assert np.isfinite(p) and -1 <= s <= 1

    def test_drn_loss_decreases(self):
        exp = tiny_drn_exp(epochs=3)
        tr = Trainer(exp, synthetic_sr_dataset(4, 16, (4, 2)),
                     synthetic_sr_dataset(2, 16, (4, 2), seed=1))
        first = tr.train_one_epoch()["total"]
        for _ in range(2):
            last = tr.train_one_epoch()["total"]
        assert last < first


class TestMeshTrainer:
    def test_epoch_driver_dp_mesh(self):
        # CLI --dp threads a mesh through the EPOCH DRIVER (not just
        # ParallelTrainer): explicit dp=2 builds a 2-device mesh, trains an
        # epoch with dp-sharded batches, and the in-training eval honors
        # --batch-size rounded to the data-axis product
        import dataclasses

        from adsr_tpu.core.config import MeshConfig

        exp = tiny_drct_exp()
        exp = dataclasses.replace(exp, mesh=MeshConfig(dp=2, tp=1))
        tr = Trainer(exp, synthetic_sr_dataset(4, 16, (2,)),
                     synthetic_sr_dataset(3, 16, (2,), seed=1))
        assert tr.mesh is not None and tr.mesh.shape["dp"] == 2
        m = tr.train_one_epoch()
        assert np.isfinite(m["total"])
        p, s = tr.test()
        assert np.isfinite(p) and -1 <= s <= 1

    def test_eval_chunk_follows_batch_size(self):
        # single-stream: Trainer.test chunks by exp.data.batch_size (the
        # round-3 hardcoded min(8, n) ignored the CLI flag)
        import dataclasses

        exp = tiny_drct_exp()
        exp = dataclasses.replace(
            exp, data=dataclasses.replace(exp.data, batch_size=3))
        calls = []
        tr = Trainer(exp, None, synthetic_sr_dataset(5, 16, (2,), seed=1))
        orig = tr.eval_forward
        tr.eval_forward = lambda p, lr: calls.append(lr.shape[0]) or orig(p, lr)
        tr.test()
        assert calls == [3, 3]  # 5 images -> two padded chunks of 3


class TestSkipThreshold:
    @pytest.mark.slow
    def test_spike_skips_update(self):
        import dataclasses
        exp = tiny_drct_exp()
        exp = dataclasses.replace(
            exp, optim=dataclasses.replace(exp.optim, skip_threshold=1.5))
        step, init_state, _ = make_train_step(exp)
        state = init_state(jax.random.key(0))
        ds = synthetic_sr_dataset(4, 16, (2,))
        lrs = [jnp.asarray(l[:2]) for l in ds.lrs]
        hr = jnp.asarray(ds.hr[:2])
        before = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
        # error_last = 0 -> any positive loss exceeds threshold -> skip
        state, metrics = step(state, lrs, hr, 1e-3, jax.random.key(1), 0.0)
        assert float(metrics["skipped"]) == 1.0
        after = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        np.testing.assert_array_equal(before, after)
        # generous error_last -> update applied
        state, metrics = step(state, lrs, hr, 1e-3, jax.random.key(1), 1e8)
        assert float(metrics["skipped"]) == 0.0
        after2 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        assert not np.array_equal(before, after2)
