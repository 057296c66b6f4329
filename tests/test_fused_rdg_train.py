"""Fused training forward + custom-VJP backward parity vs the flax model
(interpret mode, f32)."""

import os

os.environ["ADSR_TPU_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adsr_tpu.core.config import DRCTModelConfig
from adsr_tpu.models.drct import DRCT
from adsr_tpu.models.factory import fast_init
from adsr_tpu.ops.fused_rdg_train import (drop_path_mults,
                                          fused_drct_train_forward)


def _setup(cfg, seed=0, batch=2):
    model = DRCT(cfg)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(batch, cfg.img_size, cfg.img_size, cfg.in_chans)
                    * 255, jnp.float32)
    params = fast_init(model.init, jax.random.key(0), x)["params"]
    return model, params, x


# num_layers=1 keeps the fast CI lane cheap; the slow grads test and the
# --all lane cover multi-layer scan accumulation
CFG = DRCTModelConfig(upscale=2, img_size=8, window_size=4, in_chans=1,
                      embed_dim=12, num_layers=1, num_heads=2, gc=4,
                      scan_layers=True)


def test_train_forward_matches_flax():
    model, params, x = _setup(CFG)
    want = np.asarray(model.apply({"params": params}, x))
    got = np.asarray(fused_drct_train_forward(params, CFG, x,
                                              deterministic=True,
                                              dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_train_grads_match_flax():
    # end-to-end gradient parity: custom-VJP backward kernel + autodiff
    # through the (differentiable) weight packing vs plain flax autodiff.
    # num_layers=1 (interpret-mode cost); batch 2 keeps the cross-program
    # dW accumulation under test — the scan handles per-layer grads
    cfg1 = DRCTModelConfig(upscale=2, img_size=8, window_size=4, in_chans=1,
                           embed_dim=12, num_layers=1, num_heads=2, gc=4,
                           scan_layers=True)
    model, params, x = _setup(cfg1)
    hr = jnp.asarray(np.random.RandomState(1).rand(*(
        x.shape[0], x.shape[1] * cfg1.upscale, x.shape[2] * cfg1.upscale,
        x.shape[3])) * 255, jnp.float32)

    def loss_flax(p):
        sr = model.apply({"params": p}, x)
        return jnp.mean(jnp.abs(sr - hr))

    def loss_fused(p):
        sr = fused_drct_train_forward(p, cfg1, x, deterministic=True,
                                      dtype=jnp.float32)
        return jnp.mean(jnp.abs(sr - hr))

    lw, gw = jax.value_and_grad(loss_flax)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(lf), float(lw), rtol=1e-4)

    flat_w = jax.tree_util.tree_leaves_with_path(gw)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    assert len(flat_w) == len(flat_f)
    for path, leaf_w in flat_w:
        leaf_f = flat_f[path]
        a, b = np.asarray(leaf_w), np.asarray(leaf_f)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, atol=2e-3 * scale, rtol=2e-2,
            err_msg=jax.tree_util.keystr(path))


def test_train_forward_rolled_loops_match_flax(monkeypatch):
    # deep image interleaves roll the per-image loops into lax.fori_loop
    # (fused_rdg_train._per_image); force the rolled path at imgs=2 and
    # assert the same forward numerics as the unrolled path's test
    import adsr_tpu.ops.fused_rdg_train as frt
    monkeypatch.setattr(frt, "_ROLL_AT", 1)
    model, params, x = _setup(CFG)
    want = np.asarray(model.apply({"params": params}, x))
    got = np.asarray(fused_drct_train_forward(params, CFG, x,
                                              deterministic=True,
                                              dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_train_grads_rolled_loops_match_flax(monkeypatch):
    # gradient parity through the ROLLED per-image loops (traced image
    # index, pl.ds ref indexing, scratch-staged dctx/d_x0) — the layout the
    # hardware path uses at deep interleaves
    import adsr_tpu.ops.fused_rdg_train as frt
    monkeypatch.setattr(frt, "_ROLL_AT", 1)
    model, params, x = _setup(CFG)
    hr = jnp.asarray(np.random.RandomState(1).rand(*(
        x.shape[0], x.shape[1] * CFG.upscale, x.shape[2] * CFG.upscale,
        x.shape[3])) * 255, jnp.float32)

    def loss_flax(p):
        sr = model.apply({"params": p}, x)
        return jnp.mean(jnp.abs(sr - hr))

    def loss_fused(p):
        sr = fused_drct_train_forward(p, CFG, x, deterministic=True,
                                      dtype=jnp.float32)
        return jnp.mean(jnp.abs(sr - hr))

    lw, gw = jax.value_and_grad(loss_flax)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(lf), float(lw), rtol=1e-4)
    flat_w = jax.tree_util.tree_leaves_with_path(gw)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf_w in flat_w:
        a, b = np.asarray(leaf_w), np.asarray(flat_f[path])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=2e-3 * scale, rtol=2e-2,
                                   err_msg=jax.tree_util.keystr(path))


# 3x3 window grid: the shifted blocks' 9 per-window additive terms collapse
# to 4 distinct mask types (interior / right-column / bottom-row / corner,
# ops/fused_rdg.py:_attn_pair_types) — REAL dedup (types < pairs), unlike
# CFG's 2x2 grid where every window is its own type
CFG_DEDUP = DRCTModelConfig(upscale=2, img_size=12, window_size=4,
                            in_chans=1, embed_dim=12, num_layers=1,
                            num_heads=2, gc=4, scan_layers=True)


def test_attn_pair_types_dedup():
    from adsr_tpu.ops.fused_rdg import _attn_pair_types, _rdg_group
    # 3x3 grid of window-4 windows, group 1 (9 is odd): 4 distinct types
    types, reps = _attn_pair_types(12, 12, 4, 2, 1)
    assert len(types) == 9 and len(reps) == 4
    assert len(set(types)) == 4
    # every group's mask must equal its representative's mask
    from adsr_tpu.models.drct import shift_attn_mask
    mask = np.asarray(shift_attn_mask(12, 12, 4, 2))
    for j, t in enumerate(types):
        np.testing.assert_array_equal(mask[j], mask[reps[t]])
    # shift-0: one bias-only type
    types0, reps0 = _attn_pair_types(12, 12, 4, 0, 1)
    assert set(types0) == {0} and reps0 == (0,)
    # 256px/window-16 geometry (h=w=64): 16 windows, group 1, 4 types
    assert _rdg_group(16, 256) == 1
    types16, reps16 = _attn_pair_types(64, 64, 16, 8, 1)
    assert len(types16) == 16 and len(set(types16)) == 4


def test_train_forward_dedup_geometry_matches_flax():
    # forward parity at a geometry where the attn-term dedup is non-trivial
    model, params, x = _setup(CFG_DEDUP)
    want = np.asarray(model.apply({"params": params}, x))
    got = np.asarray(fused_drct_train_forward(params, CFG_DEDUP, x,
                                              deterministic=True,
                                              dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_train_grads_dedup_geometry_match_flax():
    # gradient parity with REAL attn-term dedup: the kernels accumulate
    # d(term) across the pairs sharing each mask type, and autodiff through
    # the pack's representative-row gather must still recover the exact
    # bias-table gradient (sum over ALL windows)
    model, params, x = _setup(CFG_DEDUP)
    hr = jnp.asarray(np.random.RandomState(1).rand(*(
        x.shape[0], x.shape[1] * CFG_DEDUP.upscale,
        x.shape[2] * CFG_DEDUP.upscale, x.shape[3])) * 255, jnp.float32)

    def loss_flax(p):
        return jnp.mean(jnp.abs(model.apply({"params": p}, x) - hr))

    def loss_fused(p):
        sr = fused_drct_train_forward(p, CFG_DEDUP, x, deterministic=True,
                                      dtype=jnp.float32)
        return jnp.mean(jnp.abs(sr - hr))

    lw, gw = jax.value_and_grad(loss_flax)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(lf), float(lw), rtol=1e-4)
    flat_w = jax.tree_util.tree_leaves_with_path(gw)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf_w in flat_w:
        a, b = np.asarray(leaf_w), np.asarray(flat_f[path])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=2e-3 * scale, rtol=2e-2,
                                   err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_train_grads_split_backward_match_flax(monkeypatch):
    # SPLIT backward (round 5): two chained Pallas calls over block halves
    # (4,3)/(2,1,0), the partial dcat gradient handed through HBM as f32 —
    # the structural fix for the L=4096 buffer-placement dead end. Auto
    # mode only splits above L=1024 (too big for interpret CI), so force
    # the split at the dedup geometry and require flax-parity gradients.
    monkeypatch.setenv("ADSR_TPU_TRAIN_BWD_SPLIT", "1")
    from adsr_tpu.ops.fused_rdg_train import _bwd_split
    assert _bwd_split(144) == ((4, 3), (2, 1, 0))
    model, params, x = _setup(CFG_DEDUP)
    hr = jnp.asarray(np.random.RandomState(1).rand(*(
        x.shape[0], x.shape[1] * CFG_DEDUP.upscale,
        x.shape[2] * CFG_DEDUP.upscale, x.shape[3])) * 255, jnp.float32)

    def loss_flax(p):
        return jnp.mean(jnp.abs(model.apply({"params": p}, x) - hr))

    def loss_fused(p):
        sr = fused_drct_train_forward(p, CFG_DEDUP, x, deterministic=True,
                                      dtype=jnp.float32)
        return jnp.mean(jnp.abs(sr - hr))

    lw, gw = jax.value_and_grad(loss_flax)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(lf), float(lw), rtol=1e-4)
    flat_w = jax.tree_util.tree_leaves_with_path(gw)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf_w in flat_w:
        a, b = np.asarray(leaf_w), np.asarray(flat_f[path])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=2e-3 * scale, rtol=2e-2,
                                   err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_train_grads_rolled_pair_loops_match_flax(monkeypatch):
    # the 256px geometry (npair=16) rolls the per-pair attention loops into
    # lax.fori_loop with the ARITHMETIC pair->type lookup (_pair_roll_plan);
    # force the rolled path at the small dedup geometry and require the
    # same gradients as the unrolled/static-type path
    from adsr_tpu.ops import fused_rdg_train as mod
    assert mod._pair_roll_plan(12, 12, 4, 2, 1, (0, 0, 1, 0, 0, 1, 2, 2, 3))
    monkeypatch.setattr(mod, "_PAIR_ROLL_AT", 1)
    model, params, x = _setup(CFG_DEDUP)
    hr = jnp.asarray(np.random.RandomState(1).rand(*(
        x.shape[0], x.shape[1] * CFG_DEDUP.upscale,
        x.shape[2] * CFG_DEDUP.upscale, x.shape[3])) * 255, jnp.float32)

    def loss_flax(p):
        return jnp.mean(jnp.abs(model.apply({"params": p}, x) - hr))

    def loss_fused(p):
        sr = fused_drct_train_forward(p, CFG_DEDUP, x, deterministic=True,
                                      dtype=jnp.float32)
        return jnp.mean(jnp.abs(sr - hr))

    lw, gw = jax.value_and_grad(loss_flax)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(lf), float(lw), rtol=1e-4)
    flat_w = jax.tree_util.tree_leaves_with_path(gw)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf_w in flat_w:
        a, b = np.asarray(leaf_w), np.asarray(flat_f[path])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=2e-3 * scale, rtol=2e-2,
                                   err_msg=jax.tree_util.keystr(path))


def test_train_forward_bf16_path_parity():
    # the hardware train path packs and computes in bf16 — run those exact
    # numerics (bf16 operands, f32 LN/softmax internals) in interpret mode
    # against the flax f32 oracle (mirrors the serving-path bf16 test the
    # round-2 advisor asked for)
    model, params, x = _setup(CFG)
    want = np.asarray(model.apply({"params": params}, x))
    got = np.asarray(fused_drct_train_forward(params, CFG, x,
                                              deterministic=True,
                                              dtype=jnp.bfloat16))
    err = np.abs(got - want)
    assert err.max() < 5.0 and err.mean() < 1.0, (err.max(), err.mean())


@pytest.mark.slow
def test_train_grads_bf16_exp2_path(monkeypatch):
    # the hardware train path packs bf16 -> exp2 softmax with the pre-folded
    # log2e and -_EXP2_SHIFT (no per-tile max reduction); interpret-run that
    # exact numerics path end-to-end through value_and_grad vs the flax f32
    # oracle with bf16-scale tolerances (direction + magnitude, not bitwise)
    monkeypatch.delenv("ADSR_TPU_TRAIN_STABLE", raising=False)
    model, params, x = _setup(CFG)
    hr = jnp.asarray(np.random.RandomState(1).rand(*(
        x.shape[0], x.shape[1] * CFG.upscale, x.shape[2] * CFG.upscale,
        x.shape[3])) * 255, jnp.float32)

    def loss_flax(p):
        return jnp.mean(jnp.abs(model.apply({"params": p}, x) - hr))

    def loss_fused(p):
        sr = fused_drct_train_forward(p, CFG, x, deterministic=True,
                                      dtype=jnp.bfloat16)
        return jnp.mean(jnp.abs(sr - hr))

    lw, gw = jax.value_and_grad(loss_flax)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    assert float(lf) == pytest.approx(float(lw), rel=2e-2)
    flat_w = jax.tree_util.tree_leaves_with_path(gw)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf_w in flat_w:
        key = jax.tree_util.keystr(path)
        a, b = np.asarray(leaf_w), np.asarray(flat_f[path])
        scale = max(np.abs(a).max(), 1e-6)
        # strict bound on the KERNEL subtree (what this test is about);
        # the XLA head/tail glue runs its convs in bf16 on this path, and
        # a bias grad there is a long sum of one-ulp bf16 terms that
        # saturates (measured: conv_last bias -0.5 vs f32's -0.97, on the
        # STABLE bf16 path too — a mixed-precision artifact predating and
        # unrelated to the exp2 kernels), so glue leaves only get a
        # same-sign-and-order sanity bound
        tol = 0.08 if "'rdgs'" in key else 0.6
        np.testing.assert_allclose(b, a, atol=tol * scale, err_msg=key)


@pytest.mark.slow
def test_train_grads_pure_sum_loss():
    # regression for the round-3 "sum-shaped cotangent" hardware fault: a
    # loss whose dL/d(out) is a broadcast of one scalar must produce correct
    # gradients through the fused path (the bwd wrapper now densifies the
    # cotangent with a runtime-opaque zero — ops/fused_rdg_train.py
    # _rdg_train_bwd). Interpret mode checks numerics; the hardware twin is
    # scripts/bench_fused_train_hw.py gradonly with ADSR_GRADONLY_SUM=1.
    model, params, x = _setup(CFG)

    def loss_flax(p):
        return jnp.sum(model.apply({"params": p}, x)) * 1e-6

    def loss_fused(p):
        return jnp.sum(fused_drct_train_forward(
            p, CFG, x, deterministic=True, dtype=jnp.float32)) * 1e-6

    lw, gw = jax.value_and_grad(loss_flax)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(lf), float(lw), rtol=1e-4)
    flat_w = jax.tree_util.tree_leaves_with_path(gw)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf_w in flat_w:
        a, b = np.asarray(leaf_w), np.asarray(flat_f[path])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=2e-3 * scale, rtol=2e-2,
                                   err_msg=jax.tree_util.keystr(path))


def test_train_score_bound_guard():
    # the train-side twin of serving's pack-time exp2 guard: ordinary init
    # params sit far under EXP2_SAFE_BOUND; an adversarial folded-LN scale
    # trips it, and stable=True keeps the fused forward finite on exactly
    # those params (the path the Trainer falls back to)
    from adsr_tpu.ops.fused_rdg_train import (EXP2_SAFE_BOUND,
                                              train_score_bound)
    model, params, x = _setup(CFG)
    n = CFG.img_size
    ok = train_score_bound(params, CFG, n, n)
    assert ok < EXP2_SAFE_BOUND, ok

    bad = jax.tree_util.tree_map(lambda a: a, params)
    swin = dict(bad["rdgs"]["rdg"]["swin1"])
    swin["norm1"] = dict(swin["norm1"])
    swin["norm1"]["scale"] = swin["norm1"]["scale"] * 1e4
    bad["rdgs"] = {"rdg": {**bad["rdgs"]["rdg"], "swin1": swin}}
    tripped = train_score_bound(bad, CFG, n, n)
    assert tripped > EXP2_SAFE_BOUND, tripped

    out = fused_drct_train_forward(bad, CFG, x, deterministic=True,
                                   dtype=jnp.bfloat16, stable=True)
    assert np.isfinite(np.asarray(out)).all()


def test_trainer_softmax_guard_rebuilds_stable(monkeypatch):
    # Trainer-level wiring: a pathological param load + apply_softmax_guard
    # must flip the step onto the stabilised kernels (observed via the
    # stable flag reaching fused_drct_train_forward at trace time)
    import dataclasses

    from adsr_tpu.core.config import drct_experiment
    from adsr_tpu.train import trainer as trainer_mod

    monkeypatch.setenv("ADSR_TPU_FUSED_TRAIN", "force")
    exp = drct_experiment(classe="grid", resolution=8, scale=2,
                          precision="bf16")
    exp = dataclasses.replace(
        exp, model=CFG, data=dataclasses.replace(exp.data, batch_size=2))
    t = trainer_mod.Trainer(exp, None, None)
    seen = {}
    real = trainer_mod.make_train_step

    def spy(e, mesh=None, softmax_stable=False):
        seen["stable"] = softmax_stable
        return real(e, mesh, softmax_stable)

    monkeypatch.setattr(trainer_mod, "make_train_step", spy)
    prim = dict(t.state.params["primal"])
    swin = dict(prim["rdgs"]["rdg"]["swin1"])
    swin["norm1"] = dict(swin["norm1"])
    swin["norm1"]["scale"] = swin["norm1"]["scale"] * 1e4
    prim["rdgs"] = {"rdg": {**prim["rdgs"]["rdg"], "swin1": swin}}
    t.state = t.state.replace(params={**t.state.params, "primal": prim})
    t.apply_softmax_guard()
    assert seen.get("stable") is True


def test_drop_path_mults_schedule():
    # needs >=2 layers for the later-layer rates; pure host math, no init
    import dataclasses
    cfg2 = dataclasses.replace(CFG, num_layers=2)
    mults = drop_path_mults(jax.random.key(0), cfg2, 4, deterministic=True)
    assert mults.shape == (2, 4, 10)
    np.testing.assert_allclose(np.asarray(mults), 1.0)
    # stochastic: layer 0 has rate 0 -> all ones; later layers 0 or 1/keep
    m = np.asarray(drop_path_mults(jax.random.key(1), cfg2, 64,
                                   deterministic=False))
    np.testing.assert_allclose(m[0], 1.0)
    total = 6 * cfg2.num_layers
    keep = 1.0 - 0.1 * 6 / (total - 1)
    for v in np.unique(m[1]):
        assert np.isclose(v, 0.0) or np.isclose(v, 1.0 / keep, rtol=1e-5), v


def test_train_forward_droppath_zero_branch():
    # a zero multiplier on every branch of every block must reduce each RDG
    # to out = 0.2*adj(swin-less chain)...; cheap sanity: masks of ones ==
    # deterministic forward
    model, params, x = _setup(CFG)
    got_det = np.asarray(fused_drct_train_forward(params, CFG, x,
                                                  deterministic=True,
                                                  dtype=jnp.float32))
    got_rng = np.asarray(fused_drct_train_forward(
        params, CFG, x, rng=jax.random.key(5), deterministic=False,
        dtype=jnp.float32))
    # layer-0 rate is 0 and layer-1 rate tiny (0.05...): outputs must be
    # finite and close to deterministic in distribution, not identical
    assert np.isfinite(got_rng).all()
    assert got_det.shape == got_rng.shape


def test_fused_train_geometry_gate(monkeypatch):
    # the fused train path defaults through L = img_size^2 <= 4096 (the
    # round-5 split lean backward hosts the 256px/window-16 geometry on
    # v5e — trainer._fused_train_geom_ok); larger geometries need the
    # ADSR_TPU_FUSED_TRAIN_BIGL=1 opt-in ('force' keeps the kernels for
    # interpret tests; '1' respects the gate)
    import dataclasses

    from adsr_tpu.core.config import DataConfig, Experiment, OptimConfig
    from adsr_tpu.train.trainer import make_train_step

    data = DataConfig(resolution=16, patch_size=16, scale=(2,), n_colors=1,
                      batch_size=2, test_every=2)

    def bundle_for(img_size, flag):
        cfg = dataclasses.replace(CFG, img_size=img_size)
        exp = Experiment(model=cfg, data=data, optim=OptimConfig(lr=1e-3),
                         save="/tmp/t", precision="fp32")
        monkeypatch.setenv("ADSR_TPU_FUSED_TRAIN", flag)
        return make_train_step(exp)

    from adsr_tpu.train.trainer import _fused_train_geom_ok

    assert bundle_for(8, "force").use_fused_train
    assert bundle_for(128, "force").use_fused_train    # interpret: no VMEM
    assert not bundle_for(128, "1").use_fused_train    # L=16384 > budget
    # the geometry rule itself (the '1' case above also fails the backend
    # check on CPU, so pin the rule directly)
    monkeypatch.delenv("ADSR_TPU_FUSED_TRAIN_BIGL", raising=False)
    assert _fused_train_geom_ok(dataclasses.replace(CFG, img_size=32))
    assert _fused_train_geom_ok(dataclasses.replace(CFG, img_size=64))
    assert not _fused_train_geom_ok(dataclasses.replace(CFG, img_size=128))
    monkeypatch.setenv("ADSR_TPU_FUSED_TRAIN_BIGL", "1")
    assert _fused_train_geom_ok(dataclasses.replace(CFG, img_size=128))


def test_fused_train_step_matches_xla_step(monkeypatch):
    # the EXACT code path the TPU train bench takes (trainer branch ->
    # custom-VJP kernels -> optax update), interpret mode: at num_layers=1
    # every drop-path rate is 0, so the fused step and the XLA step must
    # produce the same loss and near-identical updated params in fp32
    import dataclasses

    from adsr_tpu.core.config import DataConfig, Experiment, OptimConfig
    from adsr_tpu.train.trainer import make_train_step

    cfg = dataclasses.replace(CFG)
    data = DataConfig(resolution=16, patch_size=16, scale=(2,), n_colors=1,
                      batch_size=2, test_every=2)
    exp = Experiment(model=cfg, data=data, optim=OptimConfig(lr=1e-3),
                     save="/tmp/t", precision="fp32")
    rng = np.random.RandomState(3)
    lrs = [jnp.asarray(rng.rand(2, 8, 8, 1) * 255, jnp.float32)]
    hr = jnp.asarray(rng.rand(2, 16, 16, 1) * 255, jnp.float32)

    def run(flag):
        monkeypatch.setenv("ADSR_TPU_FUSED_TRAIN", flag)
        step, init_state, _ = make_train_step(exp)
        state = init_state(jax.random.key(0))
        state, metrics = step(state, lrs, hr, 1e-3, jax.random.key(1))
        return float(metrics["total"]), state.params

    loss_x, params_x = run("0")
    loss_f, params_f = run("force")
    assert loss_f == pytest.approx(loss_x, rel=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params_x),
            jax.tree_util.tree_leaves_with_path(params_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5,
            err_msg=jax.tree_util.keystr(path))
