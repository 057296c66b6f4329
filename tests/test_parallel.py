"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from adsr_tpu.core.config import (
    DataConfig, DRCTModelConfig, DRNModelConfig, Experiment, MeshConfig,
    OptimConfig,
)
from adsr_tpu.core.mesh import make_mesh
from adsr_tpu.parallel.sharding import (
    ParallelTrainer, param_shardings, shard_train_state,
)
from adsr_tpu.train.trainer import make_train_step


def tiny_exp(model, scales, mesh_cfg, batch=8):
    data = DataConfig(resolution=16, patch_size=16, scale=scales, n_colors=1,
                      batch_size=batch, test_every=1)
    return Experiment(model=model, data=data, optim=OptimConfig(lr=1e-3),
                      mesh=mesh_cfg, save="/tmp/t", precision="fp32")


def drct_model():
    return DRCTModelConfig(upscale=2, img_size=8, window_size=4, in_chans=1,
                           embed_dim=16, num_layers=1, num_heads=2, gc=4)


class TestMesh:
    def test_mesh_shapes(self):
        m = make_mesh(MeshConfig(dp=-1, tp=1))
        assert m.shape == {"dp": 8, "tp": 1}
        m = make_mesh(MeshConfig(dp=4, tp=2))
        assert m.shape == {"dp": 4, "tp": 2}
        with pytest.raises(ValueError):
            make_mesh(MeshConfig(dp=3, tp=2))

    def test_dcn_mesh_shapes(self):
        """Multi-host layout: outer DCN data axis (SURVEY 5.8)."""
        m = make_mesh(MeshConfig(dcn=2, dp=4, tp=1))
        assert m.shape == {"dcn": 2, "dp": 4, "tp": 1}
        m = make_mesh(MeshConfig(dcn=2, dp=-1, tp=2))
        assert m.shape == {"dcn": 2, "dp": 2, "tp": 2}
        with pytest.raises(ValueError):
            make_mesh(MeshConfig(dcn=3, dp=2, tp=1))


class TestShardingRules:
    def test_tp_specs(self):
        exp = tiny_exp(drct_model(), (2,), MeshConfig(dp=4, tp=2))
        bundle = make_train_step(exp)
        # sharding rules depend only on the tree structure: eval_shape skips
        # the init compile entirely
        state = jax.eval_shape(bundle.init_state, jax.random.key(0))
        mesh = make_mesh(exp.mesh)
        specs = param_shardings(state.params, mesh)
        flat = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec
                for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]}
        # scan-stacked layers: leading [num_layers] axis stays unsharded
        qkv = [k for k in flat if k.endswith("qkv/kernel")]
        assert qkv and all(flat[k] == P(None, None, "tp") for k in qkv)
        proj = [k for k in flat if k.endswith("attn/proj/kernel")]
        assert proj and all(flat[k] == P(None, "tp", None) for k in proj)
        convs = [k for k in flat if "conv_first" in k]
        assert convs and all(flat[k] == P() for k in convs)


class TestParallelStep:
    @pytest.mark.parametrize(
        "dp,tp", [pytest.param(8, 1, marks=pytest.mark.slow),
                  pytest.param(4, 2, marks=pytest.mark.slow)])
    def test_drct_dp_tp_step(self, dp, tp):
        exp = tiny_exp(drct_model(), (2,), MeshConfig(dp=dp, tp=tp))
        tr = ParallelTrainer(exp, make_mesh(exp.mesh))
        rng = np.random.RandomState(0)
        lrs = [jnp.asarray(rng.rand(8, 8, 8, 1), jnp.float32)]
        hr = jnp.asarray(rng.rand(8, 16, 16, 1), jnp.float32)
        metrics = tr.step(lrs, hr, 1e-3, jax.random.key(1))
        assert np.isfinite(float(metrics["total"]))

    @pytest.mark.slow
    def test_drct_dcn_dp_step(self):
        """Full train step over the 3-axis (dcn, dp, tp) multi-host layout;
        numerics must match the flat 8-way dp run (same batch, same seed)."""
        model = drct_model()
        rng = np.random.RandomState(0)
        lrs = [jnp.asarray(rng.rand(8, 8, 8, 1), jnp.float32)]
        hr = jnp.asarray(rng.rand(8, 16, 16, 1), jnp.float32)

        exp_dcn = tiny_exp(model, (2,), MeshConfig(dcn=2, dp=4, tp=1))
        tr_dcn = ParallelTrainer(exp_dcn, make_mesh(exp_dcn.mesh),
                                 key=jax.random.key(0))
        m_dcn = tr_dcn.step(lrs, hr, 1e-3, jax.random.key(1))

        exp_flat = tiny_exp(model, (2,), MeshConfig(dp=8, tp=1))
        tr_flat = ParallelTrainer(exp_flat, make_mesh(exp_flat.mesh),
                                  key=jax.random.key(0))
        m_flat = tr_flat.step(lrs, hr, 1e-3, jax.random.key(1))

        assert float(m_dcn["total"]) == pytest.approx(
            float(m_flat["total"]), rel=1e-5)

    def test_drn_dp_step(self):
        model = DRNModelConfig(scale=(2, 4), n_blocks=1, n_feats=8, n_colors=1)
        exp = tiny_exp(model, (2, 4), MeshConfig(dp=8, tp=1))
        tr = ParallelTrainer(exp, make_mesh(exp.mesh))
        rng = np.random.RandomState(0)
        lrs = [jnp.asarray(rng.rand(8, 4, 4, 1), jnp.float32),
               jnp.asarray(rng.rand(8, 8, 8, 1), jnp.float32)]
        hr = jnp.asarray(rng.rand(8, 16, 16, 1), jnp.float32)
        metrics = tr.step(lrs, hr, 1e-3, jax.random.key(1))
        assert np.isfinite(float(metrics["total"]))

    @pytest.mark.slow
    def test_dp_matches_single_device(self):
        """world_size>1 must preserve single-stream numerics (SURVEY 5.8)."""
        model = drct_model()
        rng = np.random.RandomState(0)
        lrs = [jnp.asarray(rng.rand(8, 8, 8, 1), jnp.float32)]
        hr = jnp.asarray(rng.rand(8, 16, 16, 1), jnp.float32)

        exp1 = tiny_exp(model, (2,), MeshConfig(dp=1, tp=1))
        bundle = make_train_step(exp1)
        s_single = bundle.init_state(jax.random.key(0))
        s_single, m_single = bundle.step(s_single, lrs, hr, 1e-3,
                                         jax.random.key(1))

        exp8 = tiny_exp(model, (2,), MeshConfig(dp=8, tp=1))
        tr = ParallelTrainer(exp8, make_mesh(exp8.mesh),
                             key=jax.random.key(0))
        m_multi = tr.step(lrs, hr, 1e-3, jax.random.key(1))

        assert float(m_single["total"]) == pytest.approx(
            float(m_multi["total"]), rel=1e-5)
        # parameters after one step agree too
        a = jax.tree_util.tree_leaves(s_single.params)
        b = jax.tree_util.tree_leaves(tr.state.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-5)


class TestFusedShardMapTrain:
    @pytest.mark.slow  # two interpret-mode fused fwd+bwd compiles (~3 min)
    def test_fused_dp_train_step_matches_single(self, monkeypatch):
        """The fused custom-VJP train step runs under shard_map on a
        data-parallel mesh (local-batch loss, pmean'ed grads/metrics) and
        reproduces the single-stream fused step (num_layers=1 -> every
        stochastic-depth rate is 0, so the per-shard rng fold is inert)."""
        import dataclasses

        from adsr_tpu.ops import fused_rdg as frdg
        from adsr_tpu.ops import fused_rdg_train as frt

        monkeypatch.setattr(frdg, "_INTERPRET", True)
        monkeypatch.setattr(frt, "_INTERPRET", True)
        monkeypatch.setenv("ADSR_TPU_FUSED_TRAIN", "force")

        model = dataclasses.replace(drct_model(), scan_layers=True)
        rng = np.random.RandomState(0)
        lrs = [jnp.asarray(rng.rand(4, 8, 8, 1) * 255, jnp.float32)]
        hr = jnp.asarray(rng.rand(4, 16, 16, 1) * 255, jnp.float32)

        exp1 = tiny_exp(model, (2,), MeshConfig(dp=1, tp=1), batch=4)
        bundle1 = make_train_step(exp1)
        assert bundle1.use_fused_train
        s1 = bundle1.init_state(jax.random.key(0))
        s1, m1 = bundle1.step(s1, lrs, hr, 1e-3, jax.random.key(1))

        mesh = make_mesh(MeshConfig(dp=4, tp=1), devices=jax.devices()[:4])
        exp4 = tiny_exp(model, (2,), MeshConfig(dp=4, tp=1), batch=4)
        tr = ParallelTrainer(exp4, mesh, key=jax.random.key(0))
        assert tr.bundle.use_fused_train
        m4 = tr.step(lrs, hr, 1e-3, jax.random.key(1))

        assert float(m1["total"]) == pytest.approx(float(m4["total"]),
                                                   rel=1e-5)
        for x, y in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(tr.state.params)):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       atol=1e-5)

    def test_fused_train_falls_back_on_tp(self, monkeypatch):
        """tp>1 cannot shard a Pallas custom call: the bundle must pick the
        XLA model (GSPMD megatron partitioning) even when fused is forced."""
        import dataclasses

        monkeypatch.setenv("ADSR_TPU_FUSED_TRAIN", "force")
        model = dataclasses.replace(drct_model(), scan_layers=True)
        exp = tiny_exp(model, (2,), MeshConfig(dp=4, tp=2), batch=8)
        mesh = make_mesh(exp.mesh)
        bundle = make_train_step(exp, mesh=mesh)
        assert not bundle.use_fused_train


class TestShardedEval:
    def test_fused_serving_shard_map_matches(self, monkeypatch):
        """The fused Pallas serving forward runs dp-sharded under shard_map
        (GSPMD cannot partition the custom call; batch shards are
        independent) and matches the plain XLA forward."""
        from adsr_tpu.models.factory import init_sr_params
        from adsr_tpu.ops import fused_rdg as frdg
        from adsr_tpu.train.trainer import make_serving_forward

        monkeypatch.setattr(frdg, "_INTERPRET", True)
        monkeypatch.setenv("ADSR_TPU_FUSED", "force")
        exp = tiny_exp(drct_model(), (2,), MeshConfig(dp=4, tp=2))
        params, _ = init_sr_params(exp.model, jax.random.key(0), "fp32")
        mesh = make_mesh(exp.mesh)
        rng = np.random.RandomState(0)
        lr = jnp.asarray(rng.rand(8, 8, 8, 1) * 255, jnp.float32)
        got = np.asarray(make_serving_forward(exp, params, mesh=mesh)(lr))
        monkeypatch.setenv("ADSR_TPU_FUSED", "0")
        want = np.asarray(make_serving_forward(exp, params)(lr))
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    def test_batch_sharded_forward_matches(self, tmp_path):
        """dp-sharded eval produces identical SR outputs to single-device."""
        from adsr_tpu.data.pipeline import SRDataset
        from adsr_tpu.eval.evaluate import _forward_split
        model = drct_model()
        exp = tiny_exp(model, (2,), MeshConfig(dp=8, tp=1))
        bundle = make_train_step(exp)
        state = bundle.init_state(jax.random.key(0))
        rng = np.random.RandomState(0)
        hr = (rng.rand(10, 16, 16, 1) * 255).astype(np.float32)
        lr = hr.reshape(10, 8, 2, 8, 2, 1).mean(axis=(2, 4))
        ds = SRDataset(hr=hr, lrs=[lr], scales_desc=(2,),
                       filenames=[str(i) for i in range(10)])
        from adsr_tpu.train.trainer import make_serving_forward
        mesh = make_mesh(exp.mesh)
        forward = make_serving_forward(exp, state.params["primal"])
        sr_m, hr_m = _forward_split(forward, exp, ds, batch=8, mesh=mesh)
        sr_s, hr_s = _forward_split(forward, exp, ds, batch=8)
        np.testing.assert_array_equal(sr_m, sr_s)
        np.testing.assert_array_equal(hr_m, hr_s)
