"""Fused Residual Dense Group TRAINING: custom-VJP Pallas forward+backward.

The serving kernel (ops/fused_rdg.py) is forward-only; the train step fell
back to the XLA model at ~12.5% MFU (round-2 measurement) because every swin
block makes ~10 HBM round trips and remat recomputes the whole forward. This
module runs BOTH directions of each RDG (reference src/drct.py:322-396) as
one Pallas program per (image-group, RDG) with the tokens VMEM-resident —
images are ROW-STACKED per program like the serving kernel's round-3
restructure, so every row-wise op (LN, the five big matmuls, gelu,
residuals, concat add) runs once over [imgs*L, C] and only the attention
tiles / shift copies / per-sample drop-path scales iterate per image. The
per-image loops roll into ``lax.fori_loop`` at deep interleaves
(``ADSR_TPU_TRAIN_ROLL_AT``, default 3) so Mosaic compile time stays
constant in the interleave depth; the forward defaults to 2 images
(``ADSR_TPU_TRAIN_IMGS``) while the backward defaults to 1
(``ADSR_TPU_TRAIN_BWD_IMGS``) because its 40 VMEM-resident f32 dW
accumulators leave no scoped-vmem headroom for stacked token staging
(measured OOM at 2 images; the kernels need not agree — see _train_imgs).
Measured on hardware (115-TFLOPS day, batch 16): the full step is
backward-dominated, so forward stacking moves it <1% (fwd imgs 1/2/4-rolled:
171.9 / 173.0 / 158.4 img/s — the rolled loop's serialized tiles cost more
than stacking saves), and the value of the restructure is COMPILE time:
unrolled imgs=4 measured 25 min (fwd) / >90 min (bwd, killed) of Mosaic
compile vs ~3 min rolled:

- **forward**: same math as the serving kernel but training-grade numerics
  (stabilised softmax, exact-erf gelu, no folded log2e) plus per-sample
  stochastic-depth multipliers (reference src/drct.py:107-119: independent
  masks for the attention and MLP residual branches), and it emits the final
  concat buffer as a residual output;
- **residual trick**: the RDG only ever APPENDS to the concat buffer
  (block k reads cat[:, :c_k], adjust k writes columns [c_k, c_k+gc)), so
  the FINAL cat contains every block's exact input — backward needs no
  cross-block recompute chain, only per-block internal recompute
  (flash-attention style: LN stats, qkv, softmax probs, gelu are rebuilt
  in VMEM from cat while walking blocks in reverse);
- **backward**: one program per (image-group, RDG) recomputes block
  internals and produces d_x plus per-RDG weight/bias/attention-term
  gradients, which accumulate across the image-group grid inside the kernel
  (TPU grids are sequential; the dW outputs keep a constant index_map so
  the buffers stay VMEM-resident and `+=` across programs is well-defined;
  row-stacked images fold into the same dW matmuls for free).

The custom_vjp boundary sits at the PACKED operand level: packing
(_pack_rdg_layer — lane padding, LN-affine fold, query-scale fold,
relative-position-bias gather) is ordinary differentiable jnp code, so JAX
chains d(packed) back to the raw parameter tree (including the rel-pos bias
table via scatter-add) automatically.

Numerics vs the flax model: exact for deterministic forwards (tested in
interpret mode, tests/test_fused_rdg_train.py); under training, stochastic
depth uses this module's own mask stream rather than flax's internal
make_rng order (statistically identical, bitwise different).
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from adsr_tpu.core.config import DRCTModelConfig
from adsr_tpu.ops.fused_rdg import (_LOG2E, _attn_pair_types,
                                    _composed_shift_plan, _pack_rdg_layer,
                                    _rdg_group, _vext_ok, rdg_geometry)
from adsr_tpu.ops.fused_swin_block import _HAS_PLTPU, _INTERPRET

if _HAS_PLTPU:
    from jax.experimental.pallas import tpu as pltpu

_OPS_PER_BLOCK = 8   # wqkv, wproj, w1, w2, wadj, badj, bvec, attn

# Roll the per-image loops (attention tiles, shift copies) into a
# lax.fori_loop at/above this many row-stacked images, keeping the Mosaic
# instruction count constant in ``imgs`` (the fully unrolled imgs=4 backward
# measured >90 min of Mosaic compile; the serving kernel's rolled flash
# loops are the precedent, ops/fused_rdg.py _ROLL_AT). Below the threshold
# the loops unroll, preserving cross-tile scheduling freedom.
_ROLL_AT = int(os.environ.get("ADSR_TPU_TRAIN_ROLL_AT", "3"))

# Constant stability shift (log2 units, ~32 nats) pre-subtracted from the
# packed additive attention term on the exp2 path: softmax is shift-
# invariant (the ones-column rowsum carries the same 2^-46 factor, the
# ratio cancels it exactly), so the per-tile cross-lane max reduction can
# be dropped while KEEPING overflow margin — f32 exp2 overflows at 2^128,
# i.e. true scores up to ~(128+46)/log2(e) ≈ 120 nats, vs ~88 with no
# shift. Every row keeps its self-attention diagonal, so a row can never
# be all -inf-masked and the rowsum never collapses to 0 (same argument
# as the serving kernel's unstabilised path, ops/fused_rdg.py:695-706).
_EXP2_SHIFT = 46.0


def _per_image(imgs: int, body) -> None:
    """Run ``body(img)`` for each row-stacked image — unrolled below
    _ROLL_AT, rolled (traced ``img``) at/above it. Rolled bodies may only
    index REFS with the dynamic image offset (pl.ds); Mosaic has no lowering
    for dynamic_slice on values, so anything value-sliced per image must be
    staged through a scratch ref first."""
    if imgs < _ROLL_AT:
        for img in range(imgs):
            body(img)
    else:
        lax.fori_loop(0, imgs, lambda i, c: (body(i), c)[1], jnp.int32(0))


# Roll the per-(window-pair) attention loops at/above this many pairs. The
# 256px/window-16 geometry has npair=16: fully unrolled that is 96 (pair,
# head) tile bodies PER BLOCK in each of attn_rec and attn_grad — the
# backward kernel's Mosaic compile blows past 40 minutes. Rolled, the
# instruction count is constant in npair. 128px (npair=8) stays unrolled —
# identical kernel to the validated one, and the compile cache keys stay
# warm.
_PAIR_ROLL_AT = int(os.environ.get("ADSR_TPU_TRAIN_PAIR_ROLL_AT", "12"))


def _sl(start, size):
    """Static slice when ``start`` is a python int (unrolled loops — Mosaic
    gets compile-time offsets), pl.ds otherwise (rolled, traced)."""
    return (slice(start, start + size) if isinstance(start, (int, np.integer))
            else pl.ds(start, size))


def _pair_roll_plan(h, w, win, shift, group, atypes_k):
    """Arithmetic pair->type lookup for ROLLED pair loops, or None.

    A traced loop index cannot read the static ``atypes`` tuple, so the
    rolled path derives the type from the pair index. That works for the
    two patterns that actually occur: shift-0 blocks (one bias-only type)
    and the canonical half-window-shift mask structure interior /
    right-column / bottom-row / corner laid out row-major with ``group``
    dividing the windows-per-row (then type = 2*(last window-row) +
    (last group-of-the-row), ordered exactly as _attn_pair_types's
    first-seen numbering). Any other pattern returns None and the caller
    keeps the unrolled loop with the static tuple."""
    if shift == 0:
        return ("const0",)
    nw_w, nw_h = w // win, h // win
    if group <= 0 or nw_w % group:
        return None
    gpr = nw_w // group          # groups per window-row
    npair = (nw_w * nw_h) // group
    expected = tuple(2 * int(j // gpr == nw_h - 1)
                     + int(j % gpr == gpr - 1) for j in range(npair))
    return ("rc", gpr, nw_h) if expected == tuple(atypes_k) else None


def _for_pairs(npair: int, roll, atypes_k, body) -> None:
    """Run ``body(j, ja)`` over window pairs. Unrolled below _PAIR_ROLL_AT
    (python ``j``, static ``ja``); rolled at/above it when the block's type
    pattern admits the arithmetic lookup (traced ``j``/``ja`` — bodies must
    then index refs via pl.ds only, like _per_image's rolled bodies)."""
    if npair >= _PAIR_ROLL_AT and roll is not None:
        if roll[0] == "const0":
            def fb(j, cy):
                body(j, 0)
                return cy
        else:
            gpr, nwh = roll[1], roll[2]

            def fb(j, cy):
                ja = (2 * (j // gpr == nwh - 1).astype(jnp.int32)
                      + (j % gpr == gpr - 1).astype(jnp.int32))
                body(j, ja)
                return cy
        lax.fori_loop(0, npair, fb, jnp.int32(0))
    else:
        for j in range(npair):
            body(j, atypes_k[j])


# --------------------------------------------------------------------------- #
# shared in-kernel math
# --------------------------------------------------------------------------- #

def _ln_fwd(t, c):
    """LayerNorm without affine (folded into the following matmul at pack
    time); stats over the TRUE channel count, pad lanes zero."""
    mu = jnp.sum(t, axis=-1, keepdims=True) / c
    d0 = t - mu
    var = (jnp.sum(t * t, axis=-1, keepdims=True) / c) - mu * mu
    inv = lax.rsqrt(var + 1e-6)
    return d0 * inv, inv


def _ln_bwd(dy, xhat, inv, c, c_real_mask):
    """d/dx of y = xhat = (x - mu) * inv. Pad lanes must not contribute:
    ``c_real_mask`` is [1, c_p] with ones on real lanes."""
    dy = dy * c_real_mask
    m1 = jnp.sum(dy, axis=-1, keepdims=True) / c
    m2 = jnp.sum(dy * xhat, axis=-1, keepdims=True) / c
    return (dy - m1 - xhat * m2) * inv * c_real_mask


def _erf(z):
    """Abramowitz-Stegun 7.1.26 erf polynomial (Mosaic lowers no erf)."""
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))


def _gelu_fwd(x):
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _gelu_grad(x):
    phi = jnp.exp(-0.5 * x * x) * 0.3989422804014327      # N(0,1) pdf
    return 0.5 * (1.0 + _erf(x * (2.0 ** -0.5))) + x * phi


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mm_at_b(a, b):
    """a^T @ b without materialising the transpose (dot_general)."""
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _mm_a_bt(a, b):
    """a @ b^T without materialising the transpose."""
    return lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _geom(cfg: DRCTModelConfig, h: int, w: int):
    g = rdg_geometry(cfg)
    win = cfg.window_size
    n = win * win
    nw = (h // win) * (w // win)
    group = _rdg_group(nw, n)
    plans = tuple(_composed_shift_plan(h, w, win, s) if s else None
                  for s in g["shifts"])
    # per-block pair -> additive-term-type maps (see _attn_pair_types): the
    # packed terms keep one row-block per TYPE, so a_ref / dattn indexing
    # goes through these static tuples
    atypes = tuple(_attn_pair_types(h, w, win, s, group)[0]
                   for s in g["shifts"])
    # arithmetic pair->type plans for ROLLED pair loops (None = unrollable
    # only); see _pair_roll_plan / _for_pairs
    rolls = tuple(_pair_roll_plan(h, w, win, s, group, atypes[i])
                  for i, s in enumerate(g["shifts"]))
    return g, win, n, nw, group, plans, atypes, rolls


# --------------------------------------------------------------------------- #
# forward kernel
# --------------------------------------------------------------------------- #

def _dp_col(dp_ref, idx, imgs, l):
    """[imgs] per-image stochastic-depth scalars -> an [imgs*l, 1] row-block
    multiplier column (broadcast per image, then merge the leading dims)."""
    m = dp_ref[:, 0, idx].astype(jnp.float32).reshape(imgs, 1, 1)
    return jnp.broadcast_to(m, (imgs, l, 1)).reshape(imgs * l, 1)


def _fwd_kernel(x_ref, dp_ref, *refs, h, w, win, imgs, cs, cps, nhs, shifts,
                c3ps, fps, cat_p, shift_plans, atypes, pair_rolls, group,
                exp2):
    """Each program runs ``imgs`` images ROW-STACKED (the serving kernel's
    round-3 restructure, ops/fused_rdg.py:_rdg_kernel_impl): every row-wise
    op (LN, the five big matmuls, gelu, residuals, concat add) runs ONCE
    over [imgs*L, C]; only the per-window attention tiles, the shift-plan
    copies, and the per-sample drop-path residual scales iterate per image
    (the last as an [imgs*L, 1] multiplier column)."""
    (o_ref, cat_out) = refs[5 * _OPS_PER_BLOCK:5 * _OPS_PER_BLOCK + 2]
    (cat_scr, qkv_scr, win_scr, ctx_scr) = \
        refs[5 * _OPS_PER_BLOCK + 2:]
    mm_dt = x_ref.dtype
    n = win * win
    nw = (h // win) * (w // win)
    gn = group * n
    c0p = x_ref.shape[1]          # token refs are 2-D: [imgs*L, C]
    l = h * w

    cat_scr[:, :] = jnp.zeros_like(cat_scr)
    cat_scr[:, :c0p] = x_ref[...]

    for k in range(5):
        (wqkv_ref, wproj_ref, w1_ref, w2_ref, wadj_ref, badj_ref,
         bvec_ref, a_ref) = refs[_OPS_PER_BLOCK * k:_OPS_PER_BLOCK * (k + 1)]
        c, c_p, nh = cs[k], cps[k], nhs[k]
        c3_p, f_p = c3ps[k], fps[k]
        hd = c // nh
        plan = shift_plans[k]
        m_attn = _dp_col(dp_ref, 2 * k, imgs, l)
        m_mlp = _dp_col(dp_ref, 2 * k + 1, imgs, l)

        if plan is None:
            x = cat_scr[:, :c_p].astype(jnp.float32)
        else:
            def gather(img):
                ib = img * l
                for dst, src, width in plan:
                    win_scr[pl.ds(ib + dst, width), :c_p] = \
                        cat_scr[pl.ds(ib + src, width), :c_p]
            _per_image(imgs, gather)
            x = win_scr[:, :c_p].astype(jnp.float32)

        bqkv = bvec_ref[0:1, :c3_p]
        bproj = bvec_ref[1:2, :c_p]
        b1 = bvec_ref[2:3, :f_p]
        b2 = bvec_ref[3:4, :c_p]

        y, _ = _ln_fwd(x, c)
        qkv_scr[:, :c3_p] = (_mm(y.astype(mm_dt), wqkv_ref[...])
                             + bqkv).astype(qkv_scr.dtype)

        ctx_scr[:, :c_p] = jnp.zeros_like(ctx_scr[:, :c_p])
        npair = nw // group
        use_vext = _vext_ok(c, nh, c3_p)

        def attn_img(img):
            ib = img * l

            # packed terms are deduplicated to distinct mask TYPES
            # (shift-0 blocks: one bias-only type); the (j, ja) loop rolls
            # at large npair (_for_pairs)
            def pair(j, ja):
                rows = _sl(ib + j * gn, gn)
                for hh in range(nh):
                    q = qkv_scr[rows, hh * hd:hh * hd + hd]
                    kk = qkv_scr[rows, c + hh * hd:c + hh * hd + hd]
                    arow = _sl((ja * nh + hh) * gn, gn)
                    s = _mm_a_bt(q, kk) + a_ref[arow, :]
                    if exp2:
                        # log2e + the -_EXP2_SHIFT stability margin are
                        # pre-folded into the packed q/attn operands: raw
                        # native pow2, no per-tile max reduction (the
                        # rowsum normalisation cancels the shift exactly)
                        p = jnp.exp2(s)
                    else:
                        s = s - jnp.max(s, axis=-1, keepdims=True)
                        p = jnp.exp(s)
                    if use_vext:
                        # [v_h | 1] packed lanes: the ctx matmul's last
                        # column is the softmax row-sum — normalise the
                        # [gn, hd] ctx instead of the [gn, gn] probabilities
                        # (no cross-lane reduction, no full-tile divide, no
                        # p store)
                        vo = 2 * c + hh * (hd + 1)
                        ve = qkv_scr[rows, vo:vo + hd + 1]
                        cu = _mm(p.astype(mm_dt), ve)
                        ctx_scr[rows, hh * hd:(hh + 1) * hd] = \
                            (cu[:, :hd] * (1.0 / cu[:, hd:hd + 1])) \
                            .astype(ctx_scr.dtype)
                    else:
                        p = p / jnp.sum(p, axis=-1, keepdims=True)
                        v = qkv_scr[rows,
                                    2 * c + hh * hd:2 * c + hh * hd + hd]
                        ctx_scr[rows, hh * hd:(hh + 1) * hd] = \
                            _mm(p.astype(mm_dt), v).astype(ctx_scr.dtype)

            _for_pairs(npair, pair_rolls[k], atypes[k], pair)

        _per_image(imgs, attn_img)
        ctx = ctx_scr[:, :c_p].astype(mm_dt)
        x1 = x + m_attn * (_mm(ctx, wproj_ref[...]) + bproj)

        y2, _ = _ln_fwd(x1, c)
        pre = _mm(y2.astype(mm_dt), w1_ref[...]) + b1
        hmid = _gelu_fwd(pre)
        x2 = x1 + m_mlp * (_mm(hmid.astype(mm_dt), w2_ref[...]) + b2)

        adj = _mm(x2.astype(mm_dt), wadj_ref[...],) + badj_ref[0]
        if k < 4:
            adj = jnp.where(adj >= 0, adj, 0.2 * adj)
            base = cat_p - adj.shape[1]
            if plan is None:
                cat_scr[:, base:] = cat_scr[:, base:] + adj.astype(
                    cat_scr.dtype)
            else:
                # stage adj in qkv_scr (free after attention, same dtype as
                # win_scr) so the rolled scatter is ref->ref
                aw = adj.shape[1]
                qkv_scr[:, :aw] = adj.astype(qkv_scr.dtype)

                def scatter(img):
                    ib = img * l
                    for dst, src, width in plan:
                        win_scr[pl.ds(ib + src, width), :aw] = \
                            qkv_scr[pl.ds(ib + dst, width), :aw]
                _per_image(imgs, scatter)
                cat_scr[:, base:] = cat_scr[:, base:] + \
                    win_scr[:, :aw].astype(cat_scr.dtype)
        else:
            out = 0.2 * adj[:, :c0p] + x_ref[...].astype(jnp.float32)
            o_ref[...] = out.astype(o_ref.dtype)
    cat_out[...] = cat_scr[...]


# --------------------------------------------------------------------------- #
# backward kernel
# --------------------------------------------------------------------------- #

def _bwd_kernel(dp_ref, cat_ref, g_ref, *refs, h, w, win, imgs, cs, cps,
                nhs, shifts, c3ps, fps, cat_p, shift_plans, atypes,
                pair_rolls, group, exp2, ks=(4, 3, 2, 1, 0),
                dcat_in=False, emit_dx=True, lean=False):
    """Per (image-group, RDG) backward, ``imgs`` images row-stacked like
    the forward. ``ks`` is the descending tuple of block indices THIS call
    walks (all five in the monolithic layout; a contiguous suffix/prefix
    when the backward is SPLIT into two chained Pallas calls — see
    _bwd_split). refs =
    [dcat_in_ref  [imgs*L, cat_p] f32 — only when ``dcat_in``],
    len(ks) x operand refs, then outputs:
      dx_ref [imgs*L, c0p] (``emit_dx``) OR dcat_out [imgs*L, cat_p] f32,
      len(ks) x (dwqkv, dwproj, dw1, dw2, dwadj, dbvec, dbadj, dattn)
      (f32, accum)
    then scratches:
      dcat_scr [imgs*L, cat_p] f32, qkv_scr, win_scr f32, ctx_scr,
      rs_scr f32 (per-(row, head) softmax row-sum reciprocals),
      d_scr f32 (dqkv temp)

    FLASH-STYLE SCORE RECOMPUTE: the recompute pass stores only the
    [imgs*L, 128] row-sum reciprocals; the grad pass rebuilds each tile's
    normalised probabilities from qkv_scr + the additive term (identical
    f32 ops on identical staged inputs) scaled by the stored reciprocal.
    This replaces the [imgs*L*max_nh, gn] f32 score scratch — 25 MiB at
    the 256px/window-16 geometry — at the cost of one extra score matmul
    + exp sweep per tile. (A fully self-contained variant that also
    recomputes the row-sum was tried and reverted: 11% slower on the
    fwd+bwd chain for a 0.5 MiB saving.)"""
    nk = len(ks)
    if dcat_in:
        dcat_in_ref, refs = refs[0], refs[1:]
    ops = refs[:nk * _OPS_PER_BLOCK]
    outs = refs[nk * _OPS_PER_BLOCK:nk * _OPS_PER_BLOCK + 1 + nk * 8]
    dx_ref = outs[0]              # dx (emit_dx) or the dcat hand-off
    douts = outs[1:]
    (dcat_scr, qkv_scr, win_scr, ctx_scr, rs_scr,
     d_scr) = refs[nk * _OPS_PER_BLOCK + 1 + nk * 8:]
    mm_dt = cat_ref.dtype
    n = win * win
    nw = (h // win) * (w // win)
    gn = group * n
    c0p = g_ref.shape[1]          # token refs are 2-D: [imgs*L, C]
    l = h * w
    first = pl.program_id(0) == 0

    # zero-init the accumulated gradient outputs on the first program
    @pl.when(first)
    def _init():
        for o in douts:
            o[...] = jnp.zeros_like(o)

    # d_cat starts as d_out into the x_in columns (out = 0.2*adj4 + x_in)
    # for the top call; a chained lower-half call resumes from the upper
    # half's emitted dcat instead
    if dcat_in:
        dcat_scr[:, :] = dcat_in_ref[...].astype(dcat_scr.dtype)
    else:
        dcat_scr[:, :] = jnp.zeros_like(dcat_scr)
    g0 = g_ref[...].astype(jnp.float32)

    for idx, k in enumerate(ks):
        (wqkv_ref, wproj_ref, w1_ref, w2_ref, wadj_ref, badj_ref,
         bvec_ref, a_ref) = ops[_OPS_PER_BLOCK * idx:_OPS_PER_BLOCK * (idx + 1)]
        (dwqkv_o, dwproj_o, dw1_o, dw2_o, dwadj_o, dbvec_o, dbadj_o,
         dattn_o) = douts[8 * idx:8 * idx + 8]
        c, c_p, nh = cs[k], cps[k], nhs[k]
        c3_p, f_p = c3ps[k], fps[k]
        hd = c // nh
        plan = shift_plans[k]
        m_attn = _dp_col(dp_ref, 2 * k, imgs, l)
        m_mlp = _dp_col(dp_ref, 2 * k + 1, imgs, l)
        bqkv = bvec_ref[0:1, :c3_p]
        b1 = bvec_ref[2:3, :f_p]
        b2 = bvec_ref[3:4, :c_p]
        bproj = bvec_ref[1:2, :c_p]

        # ---- recompute the block forward from the saved concat buffer ----
        # the FINAL cat's lanes >= c_k hold LATER blocks' adjust outputs
        # (they were still zero when block k ran forward), so mask them out
        # or the recomputed LayerNorm stats diverge from the forward's
        cmask = (lax.broadcasted_iota(jnp.int32, (1, c_p), 1) < c) \
            .astype(jnp.float32)
        if plan is None:
            x = cat_ref[:, :c_p].astype(jnp.float32) * cmask
        else:
            def gather(img):
                ib = img * l
                for dst, src, width in plan:
                    win_scr[pl.ds(ib + dst, width), :c_p] = \
                        cat_ref[pl.ds(ib + src, width), :c_p] \
                        .astype(win_scr.dtype)
            _per_image(imgs, gather)
            x = win_scr[:, :c_p].astype(jnp.float32) * cmask
        if lean:
            # keep only the LN stats live; y1 is rebuilt from a re-read of
            # cat (bitwise: same inputs, same ops) after the attention grad
            # loop frees the staging scratches — see the dwqkv section
            mu1 = jnp.sum(x, axis=-1, keepdims=True) / c
            var1 = (jnp.sum(x * x, axis=-1, keepdims=True) / c) - mu1 * mu1
            inv1 = lax.rsqrt(var1 + 1e-6)
            qkv_scr[:, :c3_p] = (_mm(((x - mu1) * inv1).astype(mm_dt),
                                     wqkv_ref[...])
                                 + bqkv).astype(qkv_scr.dtype)
        else:
            y1, inv1 = _ln_fwd(x, c)
            qkv_scr[:, :c3_p] = (_mm(y1.astype(mm_dt), wqkv_ref[...])
                                 + bqkv).astype(qkv_scr.dtype)
        ctx_scr[:, :c_p] = jnp.zeros_like(ctx_scr[:, :c_p])
        npair = nw // group
        use_vext = _vext_ok(c, nh, c3_p)
        # head -> lane mask for the row-sum-reciprocal scratch: rinv
        # columns accumulate into a [gn, 128] register tile via
        # where-selects and store FULL-WIDTH once per pair (single-lane
        # VMEM stores at dynamic row offsets fault the v5e worker, and
        # recomputing the rowsum in the grad pass instead measured 11%
        # slower on the whole fwd+bwd chain)
        lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def attn_rec(img):
            ib = img * l

            # packed terms are deduplicated to distinct mask TYPES; the
            # (j, ja) loop rolls at large npair (_for_pairs)
            def pair(j, ja):
                rows = _sl(ib + j * gn, gn)
                rs_acc = jnp.zeros((gn, 128), jnp.float32)
                for hh in range(nh):
                    q = qkv_scr[rows, hh * hd:hh * hd + hd]
                    kk = qkv_scr[rows, c + hh * hd:c + hh * hd + hd]
                    arow = _sl((ja * nh + hh) * gn, gn)
                    s = _mm_a_bt(q, kk) + a_ref[arow, :]
                    if exp2:
                        # pre-folded log2e/-shift, see _fwd_kernel; the
                        # grad loop below only consumes the NORMALISED
                        # probabilities, which are shift-invariant
                        p = jnp.exp2(s)
                    else:
                        s = s - jnp.max(s, axis=-1, keepdims=True)
                        p = jnp.exp(s)
                    if use_vext:
                        # row-sum via the [v_h | 1] ones column (see
                        # _fwd_kernel); only the row-sum reciprocal is
                        # kept — the grad pass recomputes the tile
                        vo = 2 * c + hh * (hd + 1)
                        ve = qkv_scr[rows, vo:vo + hd + 1]
                        cu = _mm(p.astype(mm_dt), ve)
                        rinv = 1.0 / cu[:, hd:hd + 1]
                        ctx_scr[rows, hh * hd:(hh + 1) * hd] = \
                            (cu[:, :hd] * rinv).astype(ctx_scr.dtype)
                    else:
                        rinv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
                        p = p * rinv
                        v = qkv_scr[rows,
                                    2 * c + hh * hd:2 * c + hh * hd + hd]
                        ctx_scr[rows, hh * hd:(hh + 1) * hd] = \
                            _mm(p.astype(mm_dt), v).astype(ctx_scr.dtype)
                    rs_acc = jnp.where(lane == hh, rinv, rs_acc)
                rs_scr[rows, :] = rs_acc

            _for_pairs(npair, pair_rolls[k], atypes[k], pair)

        _per_image(imgs, attn_rec)
        ctx = ctx_scr[:, :c_p].astype(mm_dt)
        x1 = x + m_attn * (_mm(ctx, wproj_ref[...]) + bproj)
        if lean:
            # LEAN liveness mode (split calls, L=4096): the monolithic
            # layout keeps y1/y2/hmid/x as whole-array live VALUES across
            # the block — at L=4096 that is 6-10 MiB each and Mosaic's
            # register allocator spills ~56 MiB of slots (the true
            # round-4 OOM, masquerading as custom-call staging). Keep only
            # the LN STATS ([L,1] each) live and rebuild y1/y2/hmid at
            # their use sites from x1/pre — a sub+mul (or gelu) sweep per
            # use, bitwise identical values.
            mu2 = jnp.sum(x1, axis=-1, keepdims=True) / c
            var2 = (jnp.sum(x1 * x1, axis=-1, keepdims=True) / c
                    ) - mu2 * mu2
            inv2 = lax.rsqrt(var2 + 1e-6)
            y2v = lambda: (x1 - mu2) * inv2    # == _ln_fwd's xhat exactly
            pre = _mm(y2v().astype(mm_dt), w1_ref[...]) + b1
            x2 = x1 + m_mlp * (_mm(_gelu_fwd(pre).astype(mm_dt),
                                   w2_ref[...]) + b2)
        else:
            y2, inv2 = _ln_fwd(x1, c)
            pre = _mm(y2.astype(mm_dt), w1_ref[...]) + b1
            hmid = _gelu_fwd(pre)
            x2 = x1 + m_mlp * (_mm(hmid.astype(mm_dt), w2_ref[...]) + b2)

        # ---- gradient into this block's output x2 (via its adjust conv) ----
        if k == 4:
            # out = 0.2 * adj4[:, :c0p] + x_in ; adj4 has no leaky-relu
            aw = wadj_ref.shape[1]
            dadj = jnp.pad(0.2 * g0, ((0, 0), (0, aw - c0p)))
        else:
            aw = wadj_ref.shape[1]
            cb = cat_p - aw
            if plan is None:
                dadj_cols = dcat_scr[:, cb:]
            else:
                # the fwd scattered adj (shifted->shift0); gather the grad
                # back (shift0->shifted) with the same plan
                def dadj_gather(img):
                    ib = img * l
                    for dst, src, width in plan:
                        win_scr[pl.ds(ib + dst, width), :aw] = \
                            dcat_scr[pl.ds(ib + src, width), cb:] \
                            .astype(win_scr.dtype)
                _per_image(imgs, dadj_gather)
                dadj_cols = win_scr[:, :aw]
            # recompute adj pre-activation sign for the leaky-relu grad
            adj_pre = _mm(x2.astype(mm_dt), wadj_ref[...]) + badj_ref[0]
            dadj = jnp.where(adj_pre >= 0, dadj_cols, 0.2 * dadj_cols)
        dwadj_o[...] += _mm_at_b(x2.astype(mm_dt), dadj.astype(mm_dt))
        dbadj_o[...] += jnp.sum(dadj.astype(jnp.float32), axis=0,
                                keepdims=True)
        d_x2 = _mm_a_bt(dadj.astype(mm_dt), wadj_ref[...])

        # ---- MLP branch backward ----
        dmlp = m_mlp * d_x2
        dh = _mm_a_bt(dmlp.astype(mm_dt), w2_ref[...])
        if lean:
            dw2_o[...] += _mm_at_b(_gelu_fwd(pre).astype(mm_dt),
                                   dmlp.astype(mm_dt))
        else:
            dw2_o[...] += _mm_at_b(hmid.astype(mm_dt), dmlp.astype(mm_dt))
        db2 = jnp.sum(dmlp, axis=0, keepdims=True)
        dpre = dh * _gelu_grad(pre)
        if lean:
            dw1_o[...] += _mm_at_b(y2v().astype(mm_dt), dpre.astype(mm_dt))
        else:
            dw1_o[...] += _mm_at_b(y2.astype(mm_dt), dpre.astype(mm_dt))
        db1 = jnp.sum(dpre, axis=0, keepdims=True)
        dy2 = _mm_a_bt(dpre.astype(mm_dt), w1_ref[...])
        d_x1 = d_x2 + _ln_bwd(dy2, y2v() if lean else y2, inv2, c, cmask)

        # ---- attention branch backward ----
        dattn_br = m_attn * d_x1
        dctx = _mm_a_bt(dattn_br.astype(mm_dt), wproj_ref[...])
        # lean: re-read ctx from its scratch (still intact) instead of
        # keeping the whole-array value live since the x1 computation
        dwproj_o[...] += _mm_at_b(
            ctx_scr[:, :c_p].astype(mm_dt) if lean else ctx,
            dattn_br.astype(mm_dt))
        dbproj = jnp.sum(dattn_br, axis=0, keepdims=True)
        # per-(image, pair, head) attention grads; dqkv assembled in d_scr.
        # dctx is staged in win_scr (free after the dadj gather) so the
        # rolled per-image loop reads it ref-indexed; every consumer casts
        # to the matmul dtype anyway, so compute-dtype staging is free
        d_scr[:, :c3_p] = jnp.zeros_like(d_scr[:, :c3_p])
        win_scr[:, :c_p] = dctx.astype(win_scr.dtype)

        def attn_grad(img):
            ib = img * l

            # dattn accumulates over every pair sharing a mask TYPE (the
            # term is broadcast over those windows, so its gradient is the
            # pair sum) — and over images always; (j, ja) rolls at large
            # npair (_for_pairs)
            def pair(j, ja):
                rows = _sl(ib + j * gn, gn)
                # one full-width read per pair; per-head lanes slice the
                # register value (not the ref — see attn_rec's store note)
                rsj = rs_scr[rows, :]
                for hh in range(nh):
                    arow = _sl((ja * nh + hh) * gn, gn)
                    q = qkv_scr[rows, hh * hd:hh * hd + hd]
                    kk = qkv_scr[rows, c + hh * hd:c + hh * hd + hd]
                    # flash-style probability recompute: identical f32 ops
                    # on the same staged qkv rows as attn_rec, scaled by
                    # the stored row-sum reciprocal
                    s = _mm_a_bt(q, kk) + a_ref[arow, :]
                    if exp2:
                        p = jnp.exp2(s)
                    else:
                        p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
                    p = p * rsj[:, hh:hh + 1]
                    dctx_h = win_scr[rows, hh * hd:(hh + 1) * hd]
                    # v lanes follow the pack layout: stride hd+1 under vext
                    # (the ones column's gradient is dropped by the pack —
                    # it was built from constants — so d_scr stays zero
                    # there)
                    vo = 2 * c + hh * (hd + 1 if use_vext else hd)
                    v = qkv_scr[rows, vo:vo + hd]
                    dv = _mm_at_b(p.astype(mm_dt), dctx_h.astype(mm_dt))
                    dp = _mm_a_bt(dctx_h.astype(mm_dt), v)
                    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                    if exp2:
                        # base-2 softmax jacobian: p = softmax2(t) has
                        # dp/dt = ln2 * p (delta - p) — the ln2 belongs to
                        # EVERY score-path gradient (dattn, dq, dk); the
                        # pack's log2e folds then cancel it exactly where
                        # they apply (q cols, attn term) and the unfolded
                        # k path needs it outright
                        ds = ds * 0.6931471805599453
                    dattn_o[arow, :] += ds
                    dq = _mm(ds.astype(mm_dt), kk)
                    dk = _mm_at_b(ds.astype(mm_dt), q)
                    # every (rows, head-slice) region is written exactly
                    # once (j rows disjoint, head lanes disjoint), so plain
                    # stores suffice and d_scr can live in the compute
                    # dtype — its consumers cast to mm_dt anyway, and the
                    # 256px geometry needs the 8 MiB this saves
                    d_scr[rows, hh * hd:hh * hd + hd] = \
                        dq.astype(d_scr.dtype)
                    d_scr[rows, c + hh * hd:c + hh * hd + hd] = \
                        dk.astype(d_scr.dtype)
                    d_scr[rows, vo:vo + hd] = dv.astype(d_scr.dtype)

            _for_pairs(npair, pair_rolls[k], atypes[k], pair)

        _per_image(imgs, attn_grad)
        dqkv = d_scr[:, :c3_p]
        if lean:
            # rebuild y1 from a fresh cat read (win_scr is free again —
            # the attention grad loop consumed its dctx staging); the
            # copies and LN ops are identical to the top-of-block ones,
            # so the values are bitwise the recompute's
            if plan is None:
                xr = cat_ref[:, :c_p].astype(jnp.float32) * cmask
            else:
                _per_image(imgs, gather)
                xr = win_scr[:, :c_p].astype(jnp.float32) * cmask
            y1 = (xr - mu1) * inv1
        dwqkv_o[...] += _mm_at_b(y1.astype(mm_dt), dqkv.astype(mm_dt))
        dbqkv = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
        dy1 = _mm_a_bt(dqkv.astype(mm_dt), wqkv_ref[...])
        d_x0 = d_x1 + _ln_bwd(dy1, y1, inv1, c, cmask)

        # bias-vector grads: rows (bqkv, bproj, b1, b2, ln1_s, ln1_b,
        # ln2_s, ln2_b) — LN affine was folded into the weights at pack
        # time, so its packed-scale rows get zero grad here and autodiff
        # recovers the raw-scale grads through the (differentiable) pack
        dbvec_o[0:1, :c3_p] += dbqkv
        dbvec_o[1:2, :c_p] += dbproj
        dbvec_o[2:3, :f_p] += db1
        dbvec_o[3:4, :c_p] += db2

        # ---- push d_x0 into the concat-buffer gradient ----
        if plan is None:
            dcat_scr[:, :c_p] = dcat_scr[:, :c_p] + d_x0
        else:
            # stage in d_scr (free once dqkv is extracted) so the
            # rolled shift0-order scatter into win_scr is ref->ref
            d_scr[:, :c_p] = d_x0.astype(d_scr.dtype)

            def scat(img):
                ib = img * l
                for dst, src, width in plan:
                    win_scr[pl.ds(ib + src, width), :c_p] = \
                        d_scr[pl.ds(ib + dst, width), :c_p] \
                        .astype(win_scr.dtype)
            _per_image(imgs, scat)
            dcat_scr[:, :c_p] = dcat_scr[:, :c_p] + win_scr[:, :c_p]

    if emit_dx:
        # d_x = d_cat's x_in columns + the direct out residual; pad lanes
        # zeroed
        dx = dcat_scr[:, :c0p] + g0
        c0 = cs[0]
        mask0 = (lax.broadcasted_iota(jnp.int32, (1, c0p), 1) < c0) \
            .astype(jnp.float32)
        dx_ref[...] = (dx * mask0).astype(dx_ref.dtype)
    else:
        # hand the partial concat gradient to the chained lower-half call
        dx_ref[...] = dcat_scr[...].astype(dx_ref.dtype)


# --------------------------------------------------------------------------- #
# custom_vjp wrapper
# --------------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _rdg_train_core(cfg_key, h, w, exp2, x, dp, *ops):
    out, _ = _rdg_train_fwd_call(cfg_key, h, w, exp2, x, dp, *ops)
    return out


def _cfg_from_key(cfg_key) -> DRCTModelConfig:
    return DRCTModelConfig(**dict(cfg_key))


def _train_imgs(b: int, l: int, bwd: bool = False) -> int:
    """Images row-stacked per train program. The two kernels need NOT agree
    (the cat residual is a plain [B*L, cat_p] array either way; each kernel
    just partitions its rows), and their budgets differ: the forward stacks
    like the serving kernel (default 2), but the backward holds 40 f32
    dW accumulators VMEM-resident on top of the token staging, which
    measured scoped-vmem OOM already at 2 images — so it defaults to 1.
    The VMEM cap keeps token scratches (which scale with imgs*l) bounded at
    window-16/256px geometries (l = 4096 already fills it)."""
    var = "ADSR_TPU_TRAIN_BWD_IMGS" if bwd else "ADSR_TPU_TRAIN_IMGS"
    max_imgs = int(os.environ.get(var, "1" if bwd else "2"))
    imgs = 1
    for cand in (2, 4, 8):
        if cand <= max_imgs and b % cand == 0:
            imgs = cand
    while imgs > 1 and imgs * l > 4096:
        imgs //= 2
    return imgs


def _rdg_train_fwd_call(cfg_key, h, w, exp2, x, dp, *ops):
    cfg = _cfg_from_key(cfg_key)
    g, win, n, nw, group, plans, atypes, rolls = _geom(cfg, h, w)
    b, l, c0p = x.shape
    cat_p = g["cat_p"]
    c3ps = tuple(ops[_OPS_PER_BLOCK * k].shape[1] for k in range(5))
    fps = tuple(ops[_OPS_PER_BLOCK * k + 2].shape[1] for k in range(5))
    imgs = _train_imgs(b, l)

    kernel = functools.partial(
        _fwd_kernel, h=h, w=w, win=win, imgs=imgs, cs=g["feats"],
        cps=g["cps"], nhs=g["heads"], shifts=g["shifts"], c3ps=c3ps,
        fps=fps, cat_p=cat_p, shift_plans=plans, atypes=atypes,
        pair_rolls=rolls,
        group=group, exp2=exp2)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    # token arrays enter/leave the kernels 2-D ([B*L, C], an image-group per
    # block) so the rolled per-image loops can pl.ds-index them directly
    out, cat = pl.pallas_call(
        kernel,
        grid=(b // imgs,),
        in_specs=[pl.BlockSpec((imgs * l, c0p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  # (b, 1, 128) so the trailing block dims equal the array
                  # dims — Mosaic rejects a (1, 128) block on a (b, 128)
                  # array when b is not a multiple of 8.
                  pl.BlockSpec((imgs, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [vmem()] * len(ops),
        out_specs=[pl.BlockSpec((imgs * l, c0p), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((imgs * l, cat_p), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b * l, c0p), x.dtype),
                   jax.ShapeDtypeStruct((b * l, cat_p), x.dtype)],
        scratch_shapes=[
            pltpu.VMEM((imgs * l, cat_p), x.dtype),
            pltpu.VMEM((imgs * l, max(c3ps)), x.dtype),
            pltpu.VMEM((imgs * l, max(g["cps"])), x.dtype),
            pltpu.VMEM((imgs * l, max(g["cps"])), x.dtype),
        ],
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024)
            if _HAS_PLTPU and not _INTERPRET else None),
        interpret=_INTERPRET,
    )(x.reshape(b * l, c0p),
      jnp.pad(dp, ((0, 0), (0, 128 - dp.shape[1])))[:, None, :], *ops)
    return out.reshape(b, l, c0p), cat


def _rdg_train_fwd(cfg_key, h, w, exp2, x, dp, *ops):
    out, cat = _rdg_train_fwd_call(cfg_key, h, w, exp2, x, dp, *ops)
    return out, (dp, cat, ops)


def _bwd_split(l: int):
    """Block split for the backward: None = one monolithic Pallas call (the
    layout validated through round 4 at L<=1024); a ((upper...), (lower...))
    pair = TWO chained calls over block halves, passing the partial concat
    gradient through HBM as f32. Splitting halves both the per-call dW
    output residency (15.1 / 11.9 MiB at 256px vs 27 MiB monolithic) and
    the operand staging — the structural fix for the L=4096 XLA buffer-
    placement dead end (ARCHITECTURE.md "round-4 256px saga": every scoped-
    vmem budget either overflowed the staging or colocated all dW outputs
    into one unfittable frame) — at the cost of one dcat round trip
    (~2 x 6 MiB/image at 256px ≈ 15 us/program of HBM traffic).
    ADSR_TPU_TRAIN_BWD_SPLIT: auto (default; split above L=1024) / 1
    (always — A/B at 128px) / 0 (never)."""
    mode = os.environ.get("ADSR_TPU_TRAIN_BWD_SPLIT", "auto")
    if mode == "0" or (mode == "auto" and l <= 1024):
        return None
    return ((4, 3), (2, 1, 0))


def _rdg_train_bwd(cfg_key, h, w, exp2, res, g):
    dp, cat, ops = res
    cfg = _cfg_from_key(cfg_key)
    geo, win, n, nw, group, plans, atypes, rolls = _geom(cfg, h, w)
    l = h * w
    b = cat.shape[0] // l         # cat is the fwd kernel's 2-D [B*L, cat_p]
    c0p = geo["cps"][0]
    cat_p = geo["cat_p"]
    c3ps = tuple(ops[_OPS_PER_BLOCK * k].shape[1] for k in range(5))
    fps = tuple(ops[_OPS_PER_BLOCK * k + 2].shape[1] for k in range(5))

    imgs = _train_imgs(b, l, bwd=True)
    dp_arg = jnp.pad(dp, ((0, 0), (0, 128 - dp.shape[1])))[:, None, :]
    # Sum-shaped-cotangent guard: when dL/d(out) is a broadcast of ONE
    # scalar (a pure-sum loss — no shipped loss, but the 'w*NAME+…' spec
    # surface invites extensions), XLA builds the module around the custom
    # call in a form that faults the v5e worker (bisected round 3:
    # value-constant cotangents through a non-constant program run fine, a
    # plain optimization_barrier on g does not help, and the flax/XLA model
    # under the same loss passes — scripts/bench_fused_train_hw.py
    # stage_gradonly's ADSR_GRADONLY_* switches). Adding a runtime-OPAQUE
    # all-zero tensor (the barrier hides that it is zero) forces the
    # cotangent operand to be a dense, default-layout buffer for ANY loss
    # shape; the add costs one [B*L, c0p] VPU pass per RDG (<0.5% of the
    # step, measured in the round-4 full-step capture).
    gdense = g.reshape(b * l, c0p) + lax.optimization_barrier(
        jnp.zeros((b * l, c0p), cat.dtype)).astype(g.dtype)

    def bwd_call(ks, dcat_arg, emit_dx):
        """One backward Pallas call over the descending block tuple ``ks``;
        operand/output lists carry only those blocks' tensors (the kernel
        indexes them by position in ks order)."""
        # split calls run the lean-liveness kernel; ADSR_TPU_TRAIN_BWD_LEAN=1
        # also opts the monolithic call in (A/B lever: lean shrinks the
        # spill frame enough to admit bwd image-stacking WITHOUT the split's
        # dcat round trip)
        lean = (len(ks) < 5
                or os.environ.get("ADSR_TPU_TRAIN_BWD_LEAN") == "1")
        kernel = functools.partial(
            _bwd_kernel, h=h, w=w, win=win, imgs=imgs, cs=geo["feats"],
            cps=geo["cps"], nhs=geo["heads"], shifts=geo["shifts"],
            c3ps=c3ps, fps=fps, cat_p=cat_p, shift_plans=plans,
            atypes=atypes, pair_rolls=rolls, group=group, exp2=exp2,
            ks=ks, dcat_in=dcat_arg is not None, emit_dx=emit_dx,
            lean=lean)
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        tok = lambda wdt: pl.BlockSpec((imgs * l, wdt), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
        ops_k = []
        for kb in ks:
            ops_k += list(ops[_OPS_PER_BLOCK * kb:_OPS_PER_BLOCK * (kb + 1)])
        in_specs = [pl.BlockSpec((imgs, 1, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    tok(cat_p), tok(c0p)]
        args = [dp_arg, cat, gdense]
        if dcat_arg is not None:
            in_specs.append(tok(cat_p))
            args.append(dcat_arg)
        in_specs += [vmem()] * len(ops_k)
        args += ops_k
        # first output: dx per image (bottom call) or the f32 dcat hand-off
        # (top call); then per-block f32 grad accumulators (constant
        # index_map -> VMEM-resident, += across the sequential grid)
        if emit_dx:
            out_shapes = [jax.ShapeDtypeStruct((b * l, c0p), cat.dtype)]
            out_specs = [tok(c0p)]
        else:
            # the dcat hand-off rides HBM in the COMPUTE dtype (bf16 on
            # hardware): a one-time rounding of the mid-chain activation
            # cotangent — the same trade the bf16 dx output already makes —
            # and it halves the hand-off's double-buffered VMEM windows
            out_shapes = [jax.ShapeDtypeStruct((b * l, cat_p), cat.dtype)]
            out_specs = [tok(cat_p)]
        for kb in ks:
            for opx in (0, 1, 2, 3, 4, 6, 5, 7):   # w*, bvec, badj, attn
                shp = ops[_OPS_PER_BLOCK * kb + opx].shape
                out_shapes.append(jax.ShapeDtypeStruct(shp, jnp.float32))
                out_specs.append(vmem())
        # scratch widths sized to THIS call's blocks (the lower half's
        # c3/c maxima are smaller, shrinking its footprint further)
        c3m = max(c3ps[kb] for kb in ks)
        cpm = max(geo["cps"][kb] for kb in ks)
        # lean (split) calls stage win_scr / d_scr in the COMPUTE dtype:
        # every consumer casts to mm_dt anyway, x-staging matches the fwd
        # kernel's precision, and at L=4096 the two f32 scratches would
        # cost 11 MiB the VMEM budget does not have. The monolithic call
        # keeps f32 — at L<=1024 the round-4 probes measured bf16 staging
        # a net loss there (placement pathology + no memory pressure).
        stage_dt = cat.dtype if lean else jnp.float32
        return pl.pallas_call(
            kernel,
            grid=(b // imgs,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((imgs * l, cat_p), jnp.float32),   # dcat
                pltpu.VMEM((imgs * l, c3m), cat.dtype),       # qkv recompute
                pltpu.VMEM((imgs * l, cpm), stage_dt),        # staging/gather
                pltpu.VMEM((imgs * l, cpm), cat.dtype),       # ctx
                pltpu.VMEM((imgs * l, 128), jnp.float32),     # rowsum recips
                pltpu.VMEM((imgs * l, c3m), stage_dt),        # dqkv temp
            ],
            compiler_params=(pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024)
                if _HAS_PLTPU and not _INTERPRET else None),
            interpret=_INTERPRET,
        )(*args)

    # dW-output barrier: under the layer scan, the backward stacks
    # per-layer weight grads into [num_layers, ...] cotangent buffers via
    # dynamic-update-slice, and XLA fuses that DUS into the custom call's
    # staging fusion — whose VMEM stack frame then holds the ENTIRE
    # stacked tensor (72 MiB for block 3's dattn at L=4096: the "should
    # not be possible to run out of scoped vmem" failure; the lean
    # monolith at L=1024/imgs=2 trips the same fusion 2.7 MiB over). The
    # barrier forces the per-layer grads through HBM before the stacking
    # machinery — a write the scan makes anyway. VMEM-pressured configs
    # only: on the default 128px monolith (which fits) it measured a
    # 1.3% gradonly cost, so the validated fast path keeps XLA's fusion.
    need_barrier = (l > 1024
                    or os.environ.get("ADSR_TPU_TRAIN_BWD_LEAN") == "1")
    barrier = (lax.optimization_barrier if need_barrier
               else (lambda t: t))
    split = _bwd_split(l)
    per_block = {}
    if split is None:
        outs = bwd_call((4, 3, 2, 1, 0), None, True)
        dx_flat = outs[0]
        outs = (outs[0],) + barrier(tuple(outs[1:]))
        for i, kb in enumerate((4, 3, 2, 1, 0)):
            per_block[kb] = outs[1 + 8 * i:1 + 8 * (i + 1)]
    else:
        upper, lower = split
        outs_a = bwd_call(upper, None, False)
        outs_b = bwd_call(lower, outs_a[0], True)
        dx_flat = outs_b[0]
        outs_a = barrier(tuple(outs_a[1:]))
        outs_b = (outs_b[0],) + barrier(tuple(outs_b[1:]))
        for i, kb in enumerate(upper):
            per_block[kb] = outs_a[8 * i:8 * (i + 1)]
        for i, kb in enumerate(lower):
            per_block[kb] = outs_b[1 + 8 * i:1 + 8 * (i + 1)]

    dx = dx_flat.reshape(b, l, c0p)
    # reorder back to (wqkv, wproj, w1, w2, wadj, badj, bvec, attn) and cast
    dops = []
    for kb in range(5):
        (dwqkv, dwproj, dw1, dw2, dwadj, dbvec, dbadj, dattn) = \
            per_block[kb]
        blk_ops = ops[_OPS_PER_BLOCK * kb:_OPS_PER_BLOCK * (kb + 1)]
        ordered = (dwqkv, dwproj, dw1, dw2, dwadj, dbadj, dbvec, dattn)
        dops += [d.astype(o.dtype) for d, o in zip(ordered, blk_ops)]
    ddp = jnp.zeros_like(dp)
    return (dx, ddp) + tuple(dops)


_rdg_train_core.defvjp(_rdg_train_fwd, _rdg_train_bwd)


# --------------------------------------------------------------------------- #
# public API: full-model training forward
# --------------------------------------------------------------------------- #

def _cfg_key(cfg: DRCTModelConfig):
    import dataclasses
    return tuple(sorted(dataclasses.asdict(cfg).items()))


def pack_train(params: Dict, cfg: DRCTModelConfig, h: int, w: int,
               dtype=jnp.bfloat16, exp2: bool = False):
    """Differentiable packing of the scan-stacked DRCT tree for the train
    kernels. The v heads use the [v_h | 1] ones-column layout (vext) where
    it fits, so the kernels' ctx matmuls emit the softmax row-sums for
    free; the ones column packs from constants, so autodiff through the
    pack drops its (meaningless) gradient.

    ``exp2``: fold log2(e) into the packed q columns / additive term (like
    the serving pack) AND pre-subtract _EXP2_SHIFT from the additive term,
    so the kernels run a raw native pow2 with no per-tile max reduction.
    The fold is ordinary differentiable jnp code, so d(raw params) chains
    through the scale automatically; the constant shift has zero gradient
    and cancels exactly in the rowsum normalisation."""
    rdg = params["rdgs"]["rdg"]
    g = rdg_geometry(cfg)

    def pack(layer):
        blocks = _pack_rdg_layer(layer, cfg, h, w, dtype, vext=True)
        if exp2:
            folded = []
            for k, blk in enumerate(blocks):
                c = g["feats"][k]
                blk = dict(blk)
                blk["wqkv"] = blk["wqkv"].at[..., :c].multiply(_LOG2E)
                # bvec row 0 holds bqkv (q lanes are its first c columns)
                blk["bvec"] = blk["bvec"].at[..., 0, :c].multiply(_LOG2E)
                blk["attn"] = blk["attn"] * _LOG2E - _EXP2_SHIFT
                folded.append(blk)
            blocks = folded
        return blocks

    return jax.vmap(pack)(rdg)


def drop_path_mults(rng: jax.Array, cfg: DRCTModelConfig, b: int,
                    deterministic: bool) -> jnp.ndarray:
    """[num_layers, B, 10] per-(RDG, sample, block-branch) stochastic-depth
    multipliers (0 or 1/keep). Branch order: (attn, mlp) x blocks 0..4.
    Rate: RDG i uses dpr[6i] of linspace(0, 0.1, 6*num_layers)
    (models/drct.py:325-328, reference src/drct.py:808-812)."""
    nl = cfg.num_layers
    if deterministic:
        return jnp.ones((nl, b, 10), jnp.float32)
    total = 6 * nl
    rates = jnp.asarray([0.1 * (6 * i) / max(total - 1, 1)
                         for i in range(nl)], jnp.float32)
    keep = 1.0 - rates[:, None, None]
    u = jax.random.uniform(rng, (nl, b, 10), jnp.float32)
    return jnp.floor(keep + u) / keep


def train_score_bound(params: Dict, cfg: DRCTModelConfig, h: int,
                      w: int) -> float:
    """Largest attention score (natural-log units) the CURRENT params can
    produce through the train pack — the serving `_score_bound` power-
    iteration estimate run on the unfolded train-layout blocks. Callers
    (the Trainer) evaluate this on CONCRETE params at setup/resume time and
    pass ``stable=True`` to :func:`fused_drct_train_forward` when it
    crosses :data:`EXP2_SAFE_BOUND` — the exp2 kernels themselves never
    branch on data."""
    from adsr_tpu.ops.fused_rdg import _score_bound

    def build(p):
        blocks = pack_train(p, cfg, h, w, dtype=jnp.bfloat16, exp2=False)
        return _score_bound(list(blocks), cfg)

    return float(jax.jit(build)(params))


# exp2 overflows f32 at arg 128; with the packed -_EXP2_SHIFT margin the
# unstabilised train softmax survives true scores to (128 + 46)/log2(e)
# ~ 120 nats. Guard well below that: typical LN-bounded scores sit under
# ~15 nats, and params DRIFT during training after the setup-time check,
# so the threshold leaves ~20 nats of drift headroom on top of the
# serving guard's 80 (which has no shift margin, overflow ~88).
EXP2_SAFE_BOUND = 100.0


def fused_drct_train_forward(params: Dict, cfg: DRCTModelConfig,
                             x: jnp.ndarray, rng: jax.Array = None,
                             deterministic: bool = True,
                             dtype=jnp.bfloat16,
                             stable: bool = False) -> jnp.ndarray:
    """Training-grade DRCT forward on the fused RDG kernels; differentiable
    (custom-VJP backward kernel), matching ``DRCT.apply`` numerics for
    deterministic forwards. Head/tail convs + patch/final LayerNorm run in
    XLA (tiny share of the budget).

    ``stable=True`` forces the per-tile max-stabilised softmax (the Trainer
    sets it when :func:`train_score_bound` trips on the loaded params)."""
    from adsr_tpu.models.common import RGB_MEAN

    assert cfg.scan_layers
    c_in = cfg.in_chans
    mean = (jnp.asarray(RGB_MEAN, jnp.float32) if c_in == 3
            else jnp.zeros((c_in,), jnp.float32))
    x = (x - mean) * cfg.img_range
    x = x.astype(dtype)
    b, h, w, _ = x.shape
    d, win = cfg.embed_dim, cfg.window_size

    # exp2 fast path (bf16 only, like serving; ``stable`` is the Trainer's
    # score-bound guard, ADSR_TPU_TRAIN_STABLE=1 the manual opt-out) — pack
    # and kernels coordinate through this one flag
    exp2 = (dtype == jnp.bfloat16 and not stable
            and os.environ.get("ADSR_TPU_TRAIN_STABLE") != "1")
    blocks = pack_train(params, cfg, h, w, dtype=dtype, exp2=exp2)
    dp = drop_path_mults(
        rng if rng is not None else jax.random.key(0), cfg, b,
        deterministic)

    from adsr_tpu.ops.fused_drct import _conv, _pixel_shuffle
    head = params

    feat = _conv(x, head["conv_first"]["kernel"], head["conv_first"]["bias"])
    t0 = feat.reshape(b, h * w, d)
    tf = t0.astype(jnp.float32)
    mu = jnp.mean(tf, axis=-1, keepdims=True)
    var = jnp.var(tf, axis=-1, keepdims=True)
    t0 = ((tf - mu) * lax.rsqrt(var + 1e-6)
          * head["patch_norm"]["scale"]
          + head["patch_norm"]["bias"]).astype(dtype)

    c0p = -(-d // 128) * 128
    t = jnp.pad(t0, ((0, 0), (0, 0), (0, c0p - d)))
    hw, ww = h // win, w // win
    q = win // 2
    t = (t.reshape(b, hw, 2, q, ww, 2, q, c0p)
         .transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, h * w, c0p))

    key = _cfg_key(cfg)

    def rdg_body(t, xs):
        blk, dpl = xs
        flat = []
        for ki in range(5):
            bd = blk[ki]
            flat += [bd["wqkv"], bd["wproj"], bd["w1"], bd["w2"],
                     bd["wadj"], bd["badj"], bd["bvec"], bd["attn"]]
        return _rdg_train_core(key, h, w, exp2, t, dpl, *flat), None

    # ADSR_TPU_TRAIN_UNROLL_LAYERS=1 unrolls the layer loop (an A/B probe
    # for scan-transpose buffer placement; measured WORSE at 256px — XLA
    # overlaps the per-layer backward frames and vmem demand grows to
    # 156 MiB — so the scan stays the default everywhere)
    if os.environ.get("ADSR_TPU_TRAIN_UNROLL_LAYERS") == "1":
        for i in range(cfg.num_layers):
            blk_i = jax.tree_util.tree_map(lambda a: a[i], blocks)
            t, _ = rdg_body(t, (blk_i, dp[i]))
    else:
        t, _ = lax.scan(rdg_body, t, (blocks, dp))
    t = (t.reshape(b, hw, ww, 2, 2, q, q, c0p)
         .transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, h * w, c0p))
    t = t[:, :, :d]

    tf = t.astype(jnp.float32)
    mu = jnp.mean(tf, axis=-1, keepdims=True)
    var = jnp.var(tf, axis=-1, keepdims=True)
    t = ((tf - mu) * lax.rsqrt(var + 1e-6)
         * head["norm"]["scale"] + head["norm"]["bias"]).astype(dtype)
    deep = t.reshape(b, h, w, d)

    xb = _conv(deep, head["conv_after_body"]["kernel"],
               head["conv_after_body"]["bias"]) + feat
    xb = _conv(xb, head["conv_before_upsample"]["kernel"],
               head["conv_before_upsample"]["bias"])
    xb = jax.nn.leaky_relu(xb, 0.01)
    s, i = cfg.upscale, 0
    while s > 1:
        up = head[f"upsample_conv{i}"]
        xb = _conv(xb, up["kernel"], up["bias"])
        xb = _pixel_shuffle(xb, 2)
        s //= 2
        i += 1
    out = _conv(xb, head["conv_last"]["kernel"], head["conv_last"]["bias"])
    return out.astype(jnp.float32) / cfg.img_range + mean
