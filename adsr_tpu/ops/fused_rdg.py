"""Fused Residual Dense Group forward: one Pallas program per (image, RDG).

Round-1's ``fused_swin_block`` kept tokens VMEM-resident through ONE swin
block but bounced to XLA between blocks for the 1x1 adjust conv, the dense
concat, and the residual (~10 HBM round trips per RDG over ~16 MB of
activations — the remaining bandwidth tax identified in ARCHITECTURE.md's
audit). This kernel runs the WHOLE RDG (reference src/drct.py:322-396):

    for k in 0..4:   # 5 swin blocks, shift pattern 0/w2/0/w2/0
        x_k   = SwinBlock_k(cat[:, :c_k])          # c_k = dim + k*gc
        adj_k = leaky_relu(x_k @ W_adj_k + b_adj_k)  # 1x1 conv == matmul
        cat[:, c_k:c_k+gc] += adj_k                # dense concat growth
    out = 0.2 * adj_5 + x_in                       # src/drct.py:394

entirely inside VMEM. Two tricks make every tensor op lane-aligned:

- the concat buffer is one [L, CAT_P] scratch, zero-initialised; adjust
  weights are PRE-POSITIONED at pack time into [c_p_k, CAT_P] with the 1x1
  kernel occupying columns [c_k, c_k+gc) — the "concat" is then a full-width
  VPU add of an aligned [L, CAT_P] tensor (leaky_relu(0)=0 keeps untouched
  lanes intact);
- block-k matmuls read cat[:, :c_p_k] with weight rows >= c_k zeroed, so
  lane padding never leaks (LN scales for padded lanes are zero as well).

Attention reuses the window-pair strategy proven in fused_swin_block: pairs
of 8x8 windows as [2N, 3C] rows, one [2N, 2N] score tile per (pair, head)
with a pair-block-diagonal additive term (bias + shift mask, -1e30
off-diagonal), f32 softmax, per-head context matmul.

Tokens are WINDOW-ORDER RESIDENT: the XLA glue (ops/fused_drct.py) delivers
``x`` already permuted to shift-0 window order (a reshape/transpose fused
into the patch-embed, undone once after the 12-RDG scan), and every
row-wise op in the block (LayerNorm, the five matmuls, gelu, the dense
concat) is row-order invariant. So the shift-0 blocks (k = 0, 2, 4) run
with ZERO gather/scatter copies, and the shifted blocks (k = 1, 3) gather
only their [L, c_p] INPUT rows through a pre-composed shift0-order ->
shifted-order permutation plan and scatter-add only their [L, gc-window]
adjust output back — ~5x less copy traffic than gathering the [L, 3C] qkv
and scattering the [L, C] context every block (the round-2 profile showed
the kernel is issue-bound, so the eliminated slice-copies are the point).

Weights for all 5 blocks (~7 MB bf16) + the additive attention terms are
DMA'd once per pallas_call (constant index_map across the image grid) and
stream from HBM under lax.scan's 12-RDG loop.

Forward-only (serving); training uses the flax model. Numerics verified
against DRCT.apply in interpret mode (tests/test_fused_rdg.py).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from adsr_tpu.core.config import DRCTModelConfig
from adsr_tpu.models.drct import shift_attn_mask
from adsr_tpu.ops.fused_swin_block import (_HAS_PLTPU, _INTERPRET, _rup,
                                           build_attn_term,
                                           pack_swin_weights_jnp)

if _HAS_PLTPU:
    from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------- #
# Static geometry
# --------------------------------------------------------------------------- #

def rdg_geometry(cfg: DRCTModelConfig) -> Dict[str, Tuple]:
    """Per-block channel/head/shift arithmetic (src/drct.py:337-373)."""
    d, gc, nh = cfg.embed_dim, cfg.gc, cfg.num_heads
    shift = cfg.window_size // 2
    feats = tuple(d + k * gc for k in range(5))
    heads = (nh,) + tuple(nh - ((d + k * gc) % nh) for k in range(1, 5))
    shifts = (0, shift, 0, shift, 0)
    return {"feats": feats, "heads": heads, "shifts": shifts,
            "cps": tuple(_rup(c) for c in feats),
            "cat_p": _rup(feats[4])}


def _adj_base(g: Dict, k: int) -> int:
    """First lane of the aligned window holding adjust-k's output columns."""
    return 0 if k == 4 else (g["feats"][k] // 128) * 128


def _quadrant_perm(win: int) -> np.ndarray:
    """Within-window token order: quadrant-major. p[pos] = raster index.

    Tokens of each ``win x win`` window are stored as 4 contiguous quadrant
    blocks of (win/2)^2 rows (raster within the quadrant). The payoff: a
    half-window cyclic shift maps each shifted-window quadrant EXACTLY onto
    one source-window quadrant (dst quadrant (qr,qc) of shifted window
    (wi,wj) == quadrant (1-qr,1-qc) of window (wi+qr,wj+qc), raster order
    preserved), so the shift0->shifted permutation is nw*4 whole-quadrant
    contiguous block copies instead of H*W/shift width-``shift`` runs —
    4x fewer (and 4x larger) copy instructions in an issue-bound kernel."""
    assert win % 2 == 0, "shifted windows need an even window size"
    q = win // 2
    idx = np.arange(win * win).reshape(win, win)
    return np.concatenate([idx[qr * q:(qr + 1) * q,
                               qc * q:(qc + 1) * q].reshape(-1)
                           for qr in (0, 1) for qc in (0, 1)])


def _order_perm(h: int, w: int, win: int, shift: int) -> np.ndarray:
    """p[pos] = raster token row for quadrant-major window-order position
    over the shift-``shift`` window partition (windows in raster order)."""
    pq = _quadrant_perm(win)
    p = np.empty(h * w, np.int64)
    pos = 0
    for wi in range(h // win):
        for wj in range(w // win):
            for t in pq:
                r, c = divmod(int(t), win)
                row = (wi * win + r + shift) % h
                col = (wj * win + c + shift) % w
                p[pos] = row * w + col
                pos += 1
    return p


def _composed_shift_plan(h: int, w: int, win: int,
                         shift: int) -> Tuple[Tuple[int, int, int], ...]:
    """Contiguous-run copy plan (dst, src, width) taking token rows from
    shift-0 window order (src) to shift-``shift`` window order (dst), both
    quadrant-major. By construction (see _quadrant_perm) this is exactly
    nw*4 runs of (win/2)^2 rows each."""
    p0 = _order_perm(h, w, win, 0)     # p0[pos0] = raster row
    inv0 = np.empty_like(p0)
    inv0[p0] = np.arange(h * w)
    src0 = inv0[_order_perm(h, w, win, shift)]   # src0[pos_shift] = pos0
    runs, start = [], 0
    for i in range(1, h * w + 1):
        if i == h * w or src0[i] != src0[start] + (i - start):
            runs.append((start, int(src0[start]), i - start))
            start = i
    if shift == win // 2:              # the production case: whole quadrants
        nw = (h // win) * (w // win)
        assert len(runs) == nw * 4 and \
            all(wd == (win // 2) ** 2 for _, _, wd in runs), runs
    return tuple(runs)


def _attn_pair_types(h: int, w: int, win: int, shift: int,
                     group: int):
    """Deduplicate the per-(window-group) additive attention terms.

    The term is shared relative-position bias + the shift mask; the mask
    (src/drct.py:449-470) takes only a handful of DISTINCT per-window values
    (interior windows have none; boundary rows/columns repeat), so per-group
    terms collapse to a few types — 4 at every half-window-shift geometry
    (interior / bottom-row / right-column / corner), independent of image
    size. Packing one term per TYPE instead of per group cuts the VMEM the
    terms (and the train kernels' dattn accumulators) occupy by nw/4 — the
    enabler for the 256px/window-16 fused train geometry, where per-pair
    terms alone would exceed v5e VMEM.

    Returns ``(types, reps)``: ``types[j]`` is the type index of window
    group ``j`` (static python tuple, baked into the kernels' unrolled pair
    loops), ``reps[t]`` a representative group index per type (the pack
    keeps only those rows). Gradient flow stays exact: the kernels
    accumulate d(term) over every group sharing a type, and autodiff
    through the pack's gather routes each type's total back to the bias
    table once."""
    n = win * win
    nw = (h // win) * (w // win)
    npair = nw // group
    if shift == 0:
        # no mask: every window shares the bias-only term (existing dedup)
        return (0,) * npair, (0,)
    mask = np.asarray(shift_attn_mask(h, w, win, shift))
    keys: Dict[bytes, int] = {}
    types, reps = [], []
    for j in range(npair):
        key = mask[j * group:(j + 1) * group].tobytes()
        if key not in keys:
            keys[key] = len(keys)
            reps.append(j)
        types.append(keys[key])
    return tuple(types), tuple(reps)


def _rdg_group(nw: int, n: int) -> int:
    """Windows batched per score tile in the RDG kernel. The additive term
    masks the off-diagonal, so any group size is numerically per-window
    softmax. Measured on v5e (batch 128, 4-img interleave): group 2 -> 1180
    img/s, group 4 -> 1134 — the doubled exp/softmax elements and score-
    scratch traffic of [4N,4N] tiles outweigh the halved op count, so pairs
    stay the default (ADSR_TPU_RDG_GROUP overrides). Score tiles are capped
    at gn=256 rows: window 16 (N=256, the 256px-eval geometry) runs
    group 1 — a [512, 512] grouped tile would push the f32 score scratch
    and additive terms past VMEM."""
    cap = int(os.environ.get("ADSR_TPU_RDG_GROUP", "2"))
    group = 1
    for cand in (2, 4, 8):
        if cand <= cap and nw % cand == 0 and cand * n <= 256:
            group = cand
    return group


# --------------------------------------------------------------------------- #
# Packing: param tree -> kernel operand arrays (once, at load time)
# --------------------------------------------------------------------------- #

def _vext_ok(c: int, nh: int, c3_p: int) -> bool:
    """True when the ``nh`` softmax ones-columns fit in the qkv lane padding
    (v heads re-laid out as [v_h | 1] strides of hd+1, see _pack_rdg_layer)."""
    return 3 * c + nh <= c3_p


def _pack_rdg_layer(layer_params: Dict, cfg: DRCTModelConfig,
                    h: int, w: int, dtype,
                    vext: bool = False) -> List[Dict[str, jnp.ndarray]]:
    """One RDG's params -> 5 operand dicts (vmapped over the 12-layer axis).

    ``vext`` (serving flash-attention path only): re-lay out the v heads of
    the packed qkv as contiguous [v_h | 1] slabs of stride hd+1 — the extra
    all-ones column per head comes from a zero weight column with bias 1, so
    the kernel's ctx matmul ``p @ [v_h | 1]`` emits the softmax row-sum in
    lanes the MXU pads anyway, and no cross-lane reduction ever runs. The
    nh extra columns fit inside the existing c3_p padding for every DRCT
    block geometry (checked per block by _vext_ok; no-op where they don't)."""
    g = rdg_geometry(cfg)
    win = cfg.window_size
    d, gc = cfg.embed_dim, cfg.gc
    cat_p = g["cat_p"]
    masks = {s: (np.asarray(shift_attn_mask(h, w, win, s)) if s else None)
             for s in set(g["shifts"])}

    out = []
    for k in range(5):
        c, nh, shift = g["feats"][k], g["heads"][k], g["shifts"][k]
        pk = pack_swin_weights_jnp(layer_params[f"swin{k+1}"], c, nh, win,
                                   dtype=dtype)
        bias = pk.pop("bias")
        hd = c // nh
        if vext and _vext_ok(c, nh, pk["wqkv"].shape[1]):
            # v heads -> [v_h | 1] slabs at stride hd+1 (ones col = zero
            # weights + bias 1; later LN-affine fold adds bl @ W per column,
            # zero for the ones column, so the 1.0 survives the fold)
            w0, b0 = pk["wqkv"], pk["bqkv"]
            vcols, vb = w0[:, 2 * c:3 * c], b0[:, 2 * c:3 * c]
            for hh in range(nh):
                dst = 2 * c + hh * (hd + 1)
                w0 = w0.at[:, dst:dst + hd].set(vcols[:, hh * hd:(hh + 1) * hd])
                w0 = w0.at[:, dst + hd].set(0.0)
                b0 = b0.at[:, dst:dst + hd].set(vb[:, hh * hd:(hh + 1) * hd])
                b0 = b0.at[:, dst + hd].set(1.0)
            pk["wqkv"], pk["bqkv"] = w0, b0
        # fold the 1/sqrt(hd) query scale into the q columns of wqkv/bqkv so
        # the kernel's score matmul needs no extra VPU multiply. (On the bf16
        # serving path the softmax runs as exp2 with log2(e) additionally
        # folded in — but that fold happens POST-HOC in prepack_rdg_stack,
        # after the score-bound safety check decided the unstabilised
        # serving softmax is safe for these weights.)
        scale = (c // nh) ** -0.5
        pk["wqkv"] = pk["wqkv"].at[:, :c].multiply(scale)
        pk["bqkv"] = pk["bqkv"].at[:, :c].multiply(scale)
        # fold the LayerNorm affine into the following matmul:
        #   (xhat*s + b) @ W + bw == xhat @ (s[:,None]*W) + (b @ W + bw)
        # so the kernel normalises WITHOUT affine — two fewer full-tensor
        # VPU passes per LN (4 per block). f32 fold, then cast.
        raw = layer_params[f"swin{k+1}"]
        for lname, wname, bname in (("norm1", "wqkv", "bqkv"),
                                    ("norm2", "w1", "b1")):
            s = jnp.asarray(raw[lname]["scale"], jnp.float32)
            bl = jnp.asarray(raw[lname]["bias"], jnp.float32)
            w32 = pk[wname].astype(jnp.float32)
            pk[bname] = pk[bname] + bl[None, :] @ w32[:c]
            pk[wname] = (w32.at[:c].multiply(s[:, None])).astype(dtype)
        # additive term flattened to [P*nh*gn, gn] so the kernel's softmax
        # phase is ONE bias-add + softmax sweep over all (group, head) tiles.
        # shift-0 blocks have NO mask, so every window shares one term —
        # build it for a single group ([nh*gn, gn]) and let the kernel index
        # by head only (at window 16 the per-window broadcast would cost
        # ~1.6 MB x nw of VMEM per block for identical data)
        nw = (h // win) * (w // win)
        group = _rdg_group(nw, win * win)
        if shift == 0:
            attn = build_attn_term(bias, win, win * group, win, nh, None,
                                   group=group, perm=_quadrant_perm(win))
        else:
            attn = build_attn_term(bias, h, w, win, nh, masks[shift],
                                   group=group, perm=_quadrant_perm(win))
            # keep one term per distinct mask TYPE (see _attn_pair_types);
            # the kernels index pairs -> types through the same static map
            _, reps = _attn_pair_types(h, w, win, shift, group)
            if len(reps) < attn.shape[0]:
                attn = attn[jnp.asarray(reps)]
        attn = attn.reshape(-1, attn.shape[-1])
        # biases + LN affine as one [8, c3_p] row block
        c3_p = pk["wqkv"].shape[1]
        rows = [pk["bqkv"], pk["bproj"], pk["b1"], pk["b2"],
                pk["ln1_s"], pk["ln1_b"], pk["ln2_s"], pk["ln2_b"]]
        bvec = jnp.concatenate(
            [jnp.pad(r, ((0, 0), (0, c3_p - r.shape[1]))) for r in rows], 0)
        # adjust 1x1 conv pre-positioned into the concat buffer lanes; the
        # weight only spans the aligned 128-lane window [base, cat_p) that
        # contains its output columns, so the matmul does no dead tiles
        adj = layer_params[f"adjust{k+1}"]
        a_out = d if k == 4 else gc
        base = _adj_base(g, k)
        width = (_rup(d) if k == 4 else cat_p) - base
        col0 = (0 if k == 4 else c) - base
        wk = jnp.asarray(adj["kernel"], jnp.float32).reshape(c, a_out)
        wadj = jnp.zeros((g["cps"][k], width), jnp.float32)
        wadj = wadj.at[:c, col0:col0 + a_out].set(wk).astype(dtype)
        badj = jnp.zeros((1, width), jnp.float32)
        badj = badj.at[0, col0:col0 + a_out].set(
            jnp.asarray(adj["bias"], jnp.float32))
        out.append({"wqkv": pk["wqkv"], "wproj": pk["wproj"],
                    "w1": pk["w1"], "w2": pk["w2"],
                    "wadj": wadj, "badj": badj, "bvec": bvec,
                    # f32 attention term + f32 score scratch: measured FASTER
                    # than bf16 (1081 vs 1068 img/s) — v5e f32 transcendental
                    # throughput matches bf16, and bf16 adds cast overhead.
                    # log2(e)-scaled post-hoc in prepack_rdg_stack when the
                    # serving softmax runs as exp2; -1e30 mask entries stay
                    # finite in f32 and exp2 to exactly 0.
                    "attn": attn.astype(jnp.float32)})
    return out


def _fold_adjust_into_mlp(blk: Dict[str, jnp.ndarray]) -> Dict:
    """Serving-only pack fold: the swin-block output x2 = x1 + (gelu(h)@W2
    + b2) is consumed by NOTHING but the adjust matmul (the RDG appends only
    ``adj`` to the concat buffer; x2 itself is dead — reference
    src/drct.py:337-373 wires each block's output straight into its 1x1
    adjust conv), so

        adj = x2 @ Wadj = x1 @ Wadj + h @ (W2 @ Wadj) + (b2 @ Wadj + badj)

    and W2@Wadj folds at pack time. The kernel's [L,f_p]x[f_p,c_p] MLP-out
    matmul + [L,c_p] residual add + [L,c_p]x[c_p,width] adjust become two
    narrow [*,width] matmuls (width 128, vs c_p 256/384) — ~10% of the
    per-block MXU work removed, plus f_p*c_p -> f_p*width weight VMEM.
    Operates on the vmapped-over-layers packed dicts ([12, ...] leaves);
    the training pack (ops/fused_rdg_train.py) keeps the unfolded form
    because its backward differentiates through x2."""
    blk = dict(blk)
    w2 = blk["w2"].astype(jnp.float32)                    # [layers, f_p, c_p]
    wadj = blk["wadj"].astype(jnp.float32)                # [layers, c_p, wd]
    b2 = blk["bvec"][..., 3:4, :w2.shape[-1]].astype(jnp.float32)
    blk["w2"] = jnp.matmul(w2, wadj).astype(blk["wadj"].dtype)
    blk["badj"] = blk["badj"] + jnp.matmul(b2, wadj)
    return blk


def _score_bound(blocks: List[Dict[str, jnp.ndarray]], cfg: DRCTModelConfig,
                 iters: int = 24) -> jnp.ndarray:
    """Upper estimate of the largest attention score the packed weights can
    produce, in natural-log units (pre-softmax, pre-exp).

    Per (block, layer, head): LayerNorm rows have ||xhat||_2 <= sqrt(c), so
    |q_i . k_j| <= (sqrt(c)*sigma(Wq_h) + |bq_h|) * (sqrt(c)*sigma(Wk_h)
    + |bk_h|) with sigma the spectral norm (power iteration; the packed Wq
    already contains the folded LN affine and 1/sqrt(hd) query scale). The
    max finite entry of the additive attention term is added on top."""
    g = rdg_geometry(cfg)
    bound = jnp.asarray(0.0, jnp.float32)
    for k, blk in enumerate(blocks):
        c, nh = g["feats"][k], g["heads"][k]
        hd = c // nh
        w = jnp.asarray(blk["wqkv"], jnp.float32)[..., :c, :2 * c]
        b = jnp.asarray(blk["bvec"], jnp.float32)[..., 0, :2 * c]  # = bqkv
        # [layers, 2*nh, c, hd]: q heads then k heads
        wh = w.reshape(w.shape[:-1] + (2 * nh, hd)) \
            .swapaxes(-2, -3).reshape((-1, c, hd))
        v = jnp.ones((wh.shape[0], hd, 1), jnp.float32) / (hd ** 0.5)
        for _ in range(iters):
            u = wh @ v
            u = u / (jnp.linalg.norm(u, axis=-2, keepdims=True) + 1e-30)
            v = jnp.swapaxes(wh, -1, -2) @ u
            v = v / (jnp.linalg.norm(v, axis=-2, keepdims=True) + 1e-30)
        sig = jnp.linalg.norm(wh @ v, axis=(-2, -1))        # [layers*2nh]
        sig = sig.reshape(-1, 2 * nh)
        bn = jnp.linalg.norm(b.reshape(b.shape[0], 2 * nh, hd), axis=-1)
        amp = (c ** 0.5) * sig + bn                         # [layers, 2nh]
        qk = jnp.max(amp[:, :nh] * amp[:, nh:])
        a = jnp.asarray(blk["attn"], jnp.float32)
        amax = jnp.max(jnp.where(a > -1e29, a, -jnp.inf))
        bound = jnp.maximum(bound, qk + jnp.maximum(amax, 0.0))
    return bound


def prepack_rdg_stack(params: Dict, cfg: DRCTModelConfig, h: int, w: int,
                      dtype=jnp.bfloat16) -> Dict:
    """Scan-stacked DRCT tree -> {'blocks': [5 stacked operand dicts],
    'head': head/tail conv + norm params, 'softmax_stable': bool}.
    Run ONCE at params-load time.

    The bf16 serving softmax normally runs UNstabilised (exp2 with log2(e)
    pre-folded into the packed q columns and attention term). That is only
    safe while scores stay far from the f32 exp range, which LN-bounded
    inputs guarantee for ordinary weights — but the LN affine is folded into
    the packed qkv, so a checkpoint with a pathological LN scale could push
    scores toward overflow. _score_bound checks this at pack time; past the
    safety threshold the pack keeps natural-log units and the kernel falls
    back to the stabilised softmax path ('softmax_stable': True)."""
    assert cfg.scan_layers, "fused forward expects the scan-stacked layout"
    rdg = params["rdgs"]["rdg"]
    vext = _FLASH and dtype == jnp.bfloat16

    def _build(rdg_tree):
        blocks = [dict(b) for b in jax.vmap(
            lambda layer: _pack_rdg_layer(layer, cfg, h, w, dtype,
                                          vext=vext))(rdg_tree)]
        bound = (_score_bound(blocks, cfg) if dtype == jnp.bfloat16
                 else jnp.asarray(0.0, jnp.float32))
        if _FOLD_ADJ:
            blocks = [_fold_adjust_into_mlp(b) for b in blocks]
            # also fold the RDG-out residual scale (out = 0.2*adj5 + x_in,
            # src/drct.py:394) into block 5's packed adjust operands — adj5
            # has no leaky-relu, so the scale is linear in all three terms
            b4 = dict(blocks[4])
            for key in ("wadj", "w2"):
                b4[key] = (b4[key].astype(jnp.float32) * 0.2) \
                    .astype(b4[key].dtype)
            b4["badj"] = b4["badj"] * 0.2
            blocks[4] = b4
        return blocks, bound

    def _fold(blocks):
        # exp2(log2e*(qk + a)) == exp(qk + a), softmax-invariant: fold
        # log2(e) into the packed q columns and the additive term so the
        # kernel's exp runs as the VPU's native pow2
        g = rdg_geometry(cfg)
        out = []
        for k, blk in enumerate(blocks):
            c = g["feats"][k]
            blk = dict(blk)
            blk["wqkv"] = blk["wqkv"].at[..., :c].multiply(_LOG2E)
            # bvec row 0 holds bqkv (q lanes are its first c columns)
            blk["bvec"] = blk["bvec"].at[..., 0, :c].multiply(_LOG2E)
            blk["attn"] = blk["attn"] * _LOG2E
            out.append(blk)
        return out

    # jit the packing when the params are concrete: the eager form is
    # hundreds of tiny dispatches, ~minutes through the TPU tunnel
    traced = any(isinstance(leaf, jax.core.Tracer)
                 for leaf in jax.tree_util.tree_leaves(rdg))
    if traced:
        blocks, bound = _build(rdg)
    else:
        blocks, bound = jax.jit(_build)(rdg)

    head = {name: params[name] for name in params if name != "rdgs"}

    # NOTE: the stable/fast decision is encoded as pytree STRUCTURE (key
    # presence), not a bool leaf — a leaf would turn into a tracer when the
    # packed tree is passed through jit, and the kernel needs it statically
    stable = False
    if dtype == jnp.bfloat16:
        try:
            # f32 exp/exp2 overflow near arg 88 / 127; stay well clear
            stable = bool(float(bound) > 80.0)
            if stable:
                print(f"fused_rdg: packed-weight score bound "
                      f"{float(bound):.1f} > 80 — serving softmax falls "
                      "back to the stabilised path (unusually large folded "
                      "LayerNorm scale?)")
        except jax.errors.ConcretizationTypeError:
            stable = False      # traced pack (tests): keep the fast path
        if not stable and _EXP2:
            blocks = _fold(blocks) if traced else jax.jit(_fold)(blocks)
    out = {"blocks": blocks, "head": head}
    if stable:
        out["softmax_stable"] = ()
    if vext:
        # key-presence flag (trace-static): the packed qkv v-lanes use the
        # [v_h | 1] stride-(hd+1) layout — the kernel must read v accordingly
        out["vext"] = ()
    return out


# --------------------------------------------------------------------------- #
# pallas_call wrapper
# --------------------------------------------------------------------------- #

def fused_rdg(x: jnp.ndarray, blocks: List[Dict[str, jnp.ndarray]],
              cfg: DRCTModelConfig, h: int, w: int,
              force_stable: bool = False,
              vext: bool = False) -> jnp.ndarray:
    """x: [B, L, c_p0] tokens IN SHIFT-0 QUADRANT-MAJOR WINDOW ORDER ->
    same shape/order.

    ``blocks`` holds the 5 per-block operand dicts for ONE RDG (leading layer
    axis already sliced away by lax.scan). Each Pallas program processes
    ``imgs`` images, ROW-STACKED into ``chains`` independent dependence
    chains: within a chain the images' token rows are stacked so every
    row-wise op (LayerNorm, the five big matmuls, gelu, residuals, the
    concat add) runs ONCE over [imgs/chains*L, C] — fewer, larger ops for an
    issue-bound kernel — while separate chains interleave per swin block so
    the scheduler can overlap one chain's VPU phases with another's MXU
    matmuls.
    """
    if not _HAS_PLTPU:
        raise NotImplementedError
    g = rdg_geometry(cfg)
    win = cfg.window_size
    n = win * win
    nw = (h // win) * (w // win)
    b, l, c0p = x.shape
    cat_p = g["cat_p"]
    c3ps = tuple(blk["wqkv"].shape[1] for blk in blocks)
    fps = tuple(blk["w1"].shape[1] for blk in blocks)
    # images per program: with row-stacking the instruction count of the
    # row-wise ops no longer grows with imgs (only the attention tiles and
    # shift copies do), so 8 compiles fine (the round-2 per-image-unrolled
    # form blew past 50 min of Mosaic compile at 8)
    max_imgs = int(os.environ.get("ADSR_TPU_RDG_IMGS", "4"))
    imgs = 1
    for cand in (2, 4, 8):
        if cand <= max_imgs and b % cand == 0:
            imgs = cand
    # VMEM cap: the token scratches scale with imgs*l — at window 16 / 256px
    # (l = 4096) one image per program already fills the budget
    while imgs > 1 and imgs * l > 4096:
        imgs //= 2
    # measured on v5e (batch 128, imgs 4): chains=1 (fully row-stacked)
    # 1067.5 img/s, chains=2 1045.7, chains=4 (per-image interleave) 1052.1
    # — the op-count cut of full stacking beats the MXU/VPU overlap of
    # separate chains on this issue-bound kernel
    chains = max(1, min(int(os.environ.get("ADSR_TPU_RDG_CHAINS", "1")),
                        imgs))
    while imgs % chains:
        chains -= 1

    # x arrives in shift-0 window order (glue does the reshape/transpose);
    # shift-0 blocks need no copies at all, shifted blocks use the composed
    # shift0-order -> shifted-order permutation plan
    composed = {s: _composed_shift_plan(h, w, win, s)
                for s in set(g["shifts"]) if s}
    shift_plans = tuple(composed[s] if s else None for s in g["shifts"])

    operands = []
    for blk in blocks:
        operands += [blk["wqkv"], blk["wproj"], blk["w1"], blk["w2"],
                     blk["wadj"], blk["badj"], blk["bvec"], blk["attn"]]

    group = _rdg_group(nw, n)
    # flash path: per-tile score->exp->ctx with the ones-column rowsum (the
    # packed v lanes carry it, see _pack_rdg_layer) — no score scratch at all
    # when every block takes it
    flash_all = (vext and x.dtype == jnp.bfloat16 and not force_stable
                 and all(_vext_ok(c, nh, c3p) for c, nh, c3p
                         in zip(g["feats"], g["heads"], c3ps)))
    # deep interleaves are only compile-feasible with the flash path's rolled
    # per-image loops; the phase-split paths unroll per (pair, head) and blow
    # up Mosaic compile time past 4 images per program
    while imgs > 4 and not flash_all:
        imgs //= 2
    while imgs % chains:
        chains -= 1
    atypes = tuple(_attn_pair_types(h, w, win, s, group)[0]
                   for s in g["shifts"])
    kernel = functools.partial(
        _rdg_kernel_impl, h=h, w=w, win=win, imgs=imgs, chains=chains,
        cs=g["feats"], cps=g["cps"], nhs=g["heads"], shifts=g["shifts"],
        c3ps=c3ps, fps=fps, cat_p=cat_p, shift_plans=shift_plans,
        atypes=atypes, force_stable=force_stable, vext=vext)

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b // imgs,),
        in_specs=[pl.BlockSpec((imgs, l, c0p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [vmem()] * len(operands),
        out_specs=pl.BlockSpec((imgs, l, c0p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, c0p), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((imgs * l, cat_p), x.dtype),        # concat buffer
            pltpu.VMEM((imgs * l, max(c3ps)), x.dtype),    # qkv rows
            pltpu.VMEM((imgs * l, max(g["cps"])), x.dtype),  # shifted input
            pltpu.VMEM((imgs * l, max(g["cps"])), x.dtype),  # attn context
            pltpu.VMEM((8, 128) if flash_all else
                       (imgs * l * max(g["heads"]), group * n),
                       jnp.float32),                       # score tiles
        ],
        compiler_params=(pltpu.CompilerParams(
            # group-4 score tiles + their f32 additive terms push total VMEM
            # (weights + attn + 6 scratches) to ~98 MB; v5e has 128 MB
            vmem_limit_bytes=120 * 1024 * 1024)
            if _HAS_PLTPU and not _INTERPRET else None),
        interpret=_INTERPRET,
    )(x, *operands)
    return out


# timing-only ablation probes (NOT numerically valid): "noattn" skips the
# whole window loop, "nosoftmax" skips max/exp/normalise, "nogelu" skips the
# erf polynomial, "nogather" skips the window gather/scatter copies
_PROBE = os.environ.get("ADSR_TPU_RDG_PROBE", "")
# gelu flavour for the bf16 serving path: "tanh" (default; GPT-2-style
# approximation) or "exact" (erf polynomial, ADSR_TPU_GELU=exact). Validated
# on hardware with a trained checkpoint: exact-vs-tanh serving outputs agree
# to 62.6 dB PSNR / max 1 of 255 quantisation levels — below the bf16
# serving path's own rounding — for +13% throughput. The f32 path
# (tests, training, torch parity) always uses the exact form.
_GELU = os.environ.get("ADSR_TPU_GELU", "tanh")
# serving softmax via exp2 with log2(e) pre-folded into the packed q-scale
# and attention term (ADSR_TPU_RDG_EXP2=0 opts out)
_EXP2 = os.environ.get("ADSR_TPU_RDG_EXP2", "1") != "0"
_LOG2E = 1.4426950408889634
# fold W2@Wadj at pack time (see _fold_adjust_into_mlp;
# ADSR_TPU_RDG_FOLD_ADJ=0 opts out — pack and kernel read the same flag)
_FOLD_ADJ = os.environ.get("ADSR_TPU_RDG_FOLD_ADJ", "1") != "0"
# flash-style serving attention: score matmul -> exp2 -> ctx matmul fused per
# (pair, head) tile, with the softmax row-sum emitted by the ctx matmul via
# an all-ones v column packed into the existing qkv lane padding
# (_pack_rdg_layer vext) — no cross-lane reduction, no [gn, gn] normalisation
# sweep, no score-scratch traffic. bf16 serving path only
# (ADSR_TPU_RDG_FLASH=0 opts out; pack and wrapper coordinate via the packed
# tree's 'vext' key so a stale flag cannot desync the layouts).
_FLASH = os.environ.get("ADSR_TPU_RDG_FLASH", "1") != "0"
# roll the per-image loops (attention tiles + shift copies) into a
# lax.fori_loop when a program holds more than this many images per chain —
# keeps the Mosaic instruction count constant in ``imgs`` so deep image
# interleaves stay compileable (the fully unrolled imgs=8 form measured
# >70 min of Mosaic compile). Below the threshold the loops unroll as
# before, preserving cross-tile scheduling freedom.
_ROLL_AT = int(os.environ.get("ADSR_TPU_RDG_ROLL_AT", "8"))


def _rdg_kernel_impl(x_ref, *refs, h, w, win, imgs, chains, cs, cps, nhs,
                     shifts, c3ps, fps, cat_p, shift_plans, atypes,
                     force_stable=False, vext=False,
                     read_x=None, write_out=None):
    """Kernel body. refs = 5 x (wqkv, wproj, w1, w2, wadj, badj, bvec, attn)
    + (o_ref, cat_scr, qkv_scr, win_scr, ctx_scr, scores_scr).

    Tokens (x_ref, cat_scr) live in shift-0 quadrant-major window order
    throughout; see the module docstring. The ``imgs`` images are row-stacked
    into ``chains`` independent chains: every row-wise op runs full-width
    over one chain's [ipc*L] rows, only the per-window attention tiles and
    the shifted-block quadrant copies iterate per image.

    ``read_x(img) -> [L, c0p]`` / ``write_out(img, value_f32)`` override the
    token source/sink (used by the single-call 12-RDG stack kernel, where
    tokens live in a persistent scratch instead of x_ref/o_ref)."""
    o_ref, cat_scr, qkv_scr, win_scr, ctx_scr, scores_scr = refs[40:46]
    if read_x is None:
        read_x = lambda img: x_ref[img]
    if write_out is None:
        write_out = lambda img, v: o_ref.__setitem__(
            img, v.astype(o_ref.dtype))
    mm = x_ref.dtype
    n = win * win
    nw = (h // win) * (w // win)
    group = _rdg_group(nw, n)
    gn = group * n
    c0p = x_ref.shape[2]
    l = x_ref.shape[1]
    max_nh = max(nhs)
    ipc = imgs // chains            # images per chain
    cl = ipc * l                    # token rows per chain

    cat_scr[:, :] = jnp.zeros_like(cat_scr)
    for img in range(imgs):
        cat_scr[img * l:(img + 1) * l, :c0p] = read_x(img)

    def run_block(k, ch):
        (wqkv_ref, wproj_ref, w1_ref, w2_ref, wadj_ref, badj_ref,
         bvec_ref, a_ref) = refs[8 * k:8 * k + 8]
        c, c_p, nh = cs[k], cps[k], nhs[k]
        c3_p, f_p = c3ps[k], fps[k]
        hd = c // nh
        # None for shift-0 blocks (tokens already in their window order);
        # composed shift0->shifted permutation runs for blocks 1 and 3
        plan = shift_plans[k]
        if _PROBE == "nogather":
            plan = None
        o = ch * cl                      # row base in the token scratches
        so = ch * cl * max_nh            # row base in the score scratch

        if plan is None:
            x = cat_scr[o:o + cl, :c_p].astype(jnp.float32)  # pad lanes zero
        else:
            # gather the block INPUT rows into this block's window order:
            # whole-quadrant contiguous block copies (nw*4 per image, see
            # _quadrant_perm) — [L, c_p] instead of the [L, 3c_p] qkv gather
            # of the raster-resident layout
            def gather_img(ib):
                for dst, src, width in plan:
                    win_scr[pl.ds(ib + dst, width), :c_p] = \
                        cat_scr[pl.ds(ib + src, width), :c_p]

            if ipc >= _ROLL_AT:
                lax.fori_loop(0, ipc,
                              lambda i, cy: (gather_img(o + i * l), cy)[1],
                              jnp.int32(0))
            else:
                for img in range(ipc):
                    gather_img(o + img * l)
            x = win_scr[o:o + cl, :c_p].astype(jnp.float32)

        def layer_norm(t, c=c):
            # affine folded into the following matmul weights at pack time
            mu = jnp.sum(t, axis=-1, keepdims=True) / c
            d0 = t - mu
            var = (jnp.sum(t * t, axis=-1, keepdims=True) / c) - mu * mu
            inv = jax.lax.rsqrt(var + 1e-6)
            return d0 * inv

        bqkv = bvec_ref[0:1, :c3_p]
        bproj = bvec_ref[1:2, :c_p]
        b1 = bvec_ref[2:3, :f_p]
        if not _FOLD_ADJ:
            b2 = bvec_ref[3:4, :c_p]    # folded into badj otherwise

        def mm_or_stub(a, w_ref, n_out):
            # probe "nomatmul": timing-only ablation replacing the big
            # matmuls with a broadcast so the MXU wall share is measurable
            if _PROBE == "nomatmul":
                return jnp.broadcast_to(a[:, :1], (a.shape[0], n_out)) \
                    .astype(jnp.float32)
            return jnp.dot(a, w_ref[...], preferred_element_type=jnp.float32)

        y = layer_norm(x).astype(mm)
        qkv_scr[o:o + cl, :c3_p] = (mm_or_stub(y, wqkv_ref, c3_p)
                                    + bqkv).astype(qkv_scr.dtype)

        ctx_scr[o:o + cl, :c_p] = jnp.zeros_like(ctx_scr[o:o + cl, :c_p])
        if _PROBE != "noattn":
            npair_img = nw // group       # window pairs per image
            npair = npair_img * ipc       # ... per chain (rows contiguous)
            # qkv_scr rows are already in this block's window order (window-
            # order-resident tokens) — no gather phase
            # phase 1: all (pair, head) score matmuls (MXU) with the
            # bias-add + exp folded per tile. The 1/sqrt(hd) scale is
            # pre-folded into wqkv; on the serving (bf16-input) path exp
            # runs UNstabilised: scores are f32 from LN-bounded inputs
            # (|s| << 80, exp overflows f32 only past ~88) and the -1e30
            # mask rows still exp to exactly 0. The f32 path keeps the
            # stabilised form in phase 2.
            stable = (mm != jnp.bfloat16) or force_stable
            # serving flash path: score matmul -> exp2 -> ctx matmul fused
            # per (pair, head) tile. The packed v lanes are [v_h | 1] slabs
            # (stride hd+1, _pack_rdg_layer vext), so the ctx matmul's last
            # column IS the softmax row-sum — normalisation is a [gn, hd]
            # recip-multiply, with no cross-lane reduction, no [gn, gn]
            # sweep, and no score-scratch store/load at all.
            use_vext = vext and _vext_ok(c, nh, c3_p)
            flash = use_vext and not stable
            if flash:
                def flash_img(base):
                    # base: row offset of one image's tokens — a python int
                    # (unrolled) or a traced int32 (rolled); pair tiles never
                    # span images (npair_img * gn == l)
                    for j in range(npair_img):
                        ja = atypes[k][j]   # additive-term TYPE of this pair
                        rows = pl.ds(base + j * gn, gn)
                        for hh in range(nh):
                            q = qkv_scr[rows, hh * hd:hh * hd + hd]
                            kk = qkv_scr[rows, c + hh * hd:c + hh * hd + hd]
                            arow = slice((ja * nh + hh) * gn,
                                         (ja * nh + hh + 1) * gn)
                            s = jnp.dot(q, kk.T,
                                        preferred_element_type=jnp.float32) \
                                + a_ref[arow, :]
                            if _PROBE != "nosoftmax":
                                s = jnp.exp2(s) if _EXP2 else jnp.exp(s)
                            p = s.astype(mm)
                            vo = 2 * c + hh * (hd + 1)
                            ve = qkv_scr[rows, vo:vo + hd + 1]
                            cu = jnp.dot(p, ve,
                                         preferred_element_type=jnp.float32)
                            ctx = cu[:, :hd] * (1.0 / cu[:, hd:hd + 1])
                            ctx_scr[rows, hh * hd:(hh + 1) * hd] = \
                                ctx.astype(ctx_scr.dtype)

                if ipc >= _ROLL_AT:
                    lax.fori_loop(
                        0, ipc,
                        lambda i, cy: (flash_img(o + i * l), cy)[1],
                        jnp.int32(0))
                else:
                    for img in range(ipc):
                        flash_img(o + img * l)
            for j in range(0 if flash else npair):
                rows = slice(o + j * gn, o + (j + 1) * gn)
                # additive term: repeats per image and is deduplicated to
                # its distinct mask TYPES (shift-0 blocks: one type)
                ja = atypes[k][j % npair_img]
                for hh in range(nh):
                    if _PROBE == "aligned0":
                        # timing-only: per-head q/k slices at lane offset 0
                        # (same width) — sizes the relayout cost of the
                        # unaligned offsets hh*hd (30, 60, ...)
                        q = qkv_scr[rows, 0:hd]
                        kk = qkv_scr[rows, 0:hd]
                    else:
                        q = qkv_scr[rows, hh * hd:hh * hd + hd]
                        kk = qkv_scr[rows, c + hh * hd:c + hh * hd + hd]
                    arow = slice((ja * nh + hh) * gn, (ja * nh + hh + 1) * gn)
                    srow = slice(so + (j * nh + hh) * gn,
                                 so + (j * nh + hh + 1) * gn)
                    # kk.T lowers to the MXU's native transposed-operand
                    # form — an explicit hoisted per-pair transpose measured
                    # SLOWER (1057 vs 1080 img/s)
                    s = jnp.dot(q, kk.T, preferred_element_type=jnp.float32) \
                        + a_ref[arow, :]
                    if _PROBE != "nosoftmax" and not stable:
                        # normalise HERE, while the exp'd tile is still in
                        # registers: recip of the [gn,1] row sums + broadcast
                        # multiply replaces phase 2's full read->divide->write
                        # sweep over every score tile (~3 VMEM passes + gn x
                        # gn f32 divides per tile, measurably the largest
                        # remaining VPU block). exp2 (native pow2) when
                        # log2(e) was pre-folded into the packed weights.
                        s = jnp.exp2(s) if _EXP2 else jnp.exp(s)
                        if _PROBE != "nosum":
                            # "nosum" (timing-only): skip the cross-lane
                            # rowsum reduction + recip-multiply to size the
                            # normalisation's share of the VPU budget
                            s = s * (1.0 / jnp.sum(s, axis=-1, keepdims=True))
                    scores_scr[srow, :] = s
            # phase 2 (f32/stable path only): ONE stabilised-softmax sweep
            # over every score tile (a_ref is pre-flattened [npair*nh*gn, gn]);
            # the serving path already normalised tile-hot in phase 1
            if stable and _PROBE != "nosoftmax":
                valid = npair * nh * gn
                s = scores_scr[so:so + valid, :]
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                scores_scr[so:so + valid, :] = p.astype(scores_scr.dtype)
            # phase 3: all context matmuls back-to-back (MXU). The context
            # stays in this block's window order — proj/MLP/adjust are all
            # row-order invariant, so no scatter back to raster order.
            for j in range(0 if flash else npair):
                for hh in range(nh):
                    vo = 2 * c + hh * (hd + 1 if use_vext else hd)
                    if _PROBE == "aligned0":
                        v = qkv_scr[o + j * gn:o + (j + 1) * gn, 0:hd]
                    else:
                        v = qkv_scr[o + j * gn:o + (j + 1) * gn,
                                    vo:vo + hd]
                    pj = scores_scr[so + (j * nh + hh) * gn:
                                    so + (j * nh + hh + 1) * gn, :].astype(mm)
                    ctx_scr[o + j * gn:o + (j + 1) * gn,
                            hh * hd:(hh + 1) * hd] = \
                        jnp.dot(pj, v, preferred_element_type=jnp.float32) \
                        .astype(ctx_scr.dtype)

        ctx = ctx_scr[o:o + cl, :c_p].astype(mm)
        x = x + (mm_or_stub(ctx, wproj_ref, c_p) + bproj)

        y = layer_norm(x).astype(mm)
        hmid = mm_or_stub(y, w1_ref, f_p) + b1
        if _PROBE != "nogelu":
            if _GELU == "tanh" and mm == jnp.bfloat16:
                # GPT-2-style tanh gelu (serving only; ADSR_TPU_GELU=exact
                # opts out): 62.6 dB agreement with exact on a trained
                # checkpoint, max 1/255 level — below bf16 rounding
                inner = 0.7978845608028654 * (
                    hmid + 0.044715 * hmid * hmid * hmid)
                hmid = 0.5 * hmid * (1.0 + jnp.tanh(inner))
            else:
                # exact-form gelu via the Abramowitz-Stegun 7.1.26 erf
                # polynomial (Mosaic lowers neither erf nor erfc; max abs
                # err 1.5e-7)
                z = hmid * (2.0 ** -0.5)
                az = jnp.abs(z)
                t = 1.0 / (1.0 + 0.3275911 * az)
                poly = t * (0.254829592 + t * (-0.284496736 + t * (
                    1.421413741 + t * (-1.453152027 + t * 1.061405429))))
                erf_z = jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))
                hmid = 0.5 * hmid * (1.0 + erf_z)
        if _FOLD_ADJ:
            # x2 is dead after the adjust matmul, so W2@Wadj was folded at
            # pack time (_fold_adjust_into_mlp): two narrow [*, width]
            # matmuls replace the full [f_p, c_p] MLP-out matmul, its
            # [L, c_p] residual add, and the [c_p, width] adjust
            aw = wadj_ref.shape[1]
            adj = (mm_or_stub(x.astype(mm), wadj_ref, aw)
                   + mm_or_stub(hmid.astype(mm), w2_ref, aw)
                   + badj_ref[0])
        else:
            x = x + (mm_or_stub(hmid.astype(mm), w2_ref, c_p) + b2)
            adj = mm_or_stub(x.astype(mm), wadj_ref,
                             wadj_ref.shape[1]) + badj_ref[0]
        if k < 4:
            adj = jnp.where(adj >= 0, adj, 0.2 * adj)      # leaky_relu(0.2)
            base = cat_p - adj.shape[1]
            if plan is None:
                cat_scr[o:o + cl, base:] = cat_scr[o:o + cl, base:] \
                    + adj.astype(cat_scr.dtype)
            else:
                # stage the adjust rows back to shift-0 order (the composed
                # plan inverts run-by-run: dst+i <-> src+i), then ONE
                # full-sweep add into the concat buffer — bijective copy,
                # so no zeroing and no per-run read-modify-write
                aw = adj.shape[1]
                if ipc >= _ROLL_AT:
                    # stage adj in the (free at this point) qkv scratch so
                    # the rolled copy loop is ref->ref: Mosaic lowers dynamic
                    # offsets on refs (pl.ds) but has no lowering for
                    # dynamic_slice on values
                    qkv_scr[o:o + cl, :aw] = adj.astype(qkv_scr.dtype)

                    def scatter_img(ib):
                        for dst, src, width in plan:
                            win_scr[pl.ds(ib + src, width), :aw] = \
                                qkv_scr[pl.ds(ib + dst, width), :aw]

                    lax.fori_loop(
                        0, ipc,
                        lambda i, cy: (scatter_img(o + i * l), cy)[1],
                        jnp.int32(0))
                else:
                    adj_c = adj.astype(win_scr.dtype)
                    for img in range(ipc):
                        ib = o + img * l
                        for dst, src, width in plan:
                            win_scr[ib + src:ib + src + width, :aw] = \
                                adj_c[img * l + dst:img * l + dst + width]
                cat_scr[o:o + cl, base:] = cat_scr[o:o + cl, base:] \
                    + win_scr[o:o + cl, :aw].astype(cat_scr.dtype)
        else:
            # 0.2 residual scale pre-folded into block 5's packed operands
            # on the fold path (see prepack_rdg_stack._build)
            out = adj[:, :c0p] if _FOLD_ADJ else 0.2 * adj[:, :c0p]
            for img in range(ipc):
                gi = ch * ipc + img
                write_out(gi, out[img * l:(img + 1) * l]
                          + read_x(gi).astype(jnp.float32))

    for k in range(5):
        for ch in range(chains):
            run_block(k, ch)
