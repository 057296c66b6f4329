"""Anchor the bench.py H100 reference-throughput denominators — all families.

The reference publishes no throughput numbers (BASELINE.md), so bench.py's
``vs_baseline`` needs a defensible estimate of what the reference PyTorch
models sustain on their H100. This script derives one per family from
measurements that ARE possible in this environment (torch CPU + the real
reference models):

1. Build the real reference model (DRCT src/drct.py:716-898 at the 128px
   AND 256px geometries, DRN-L src/drn.py:160-270 at the x4 scale table,
   EfficientAD-small teacher+student+AE src/efficientAD.py:90-127, 32-88).
2. Measure eager CPU latency at batch 1 (every reference eval loop forwards
   ONE image at a time — src/evaluate.py:204-227, src/efficientAD.py:292-309).
3. Count dispatched ops per forward with torch.profiler — in eager CUDA
   each of these is >= 1 kernel launch.
4. H100 estimate = min(launch-bound, compute-bound):
   - launch-bound: n_ops x 5 us/launch (typical eager H100 launch+sync
     overhead for the tiny kernels these models produce)
   - compute-bound: per-family useful FLOPs (JAX XLA cost analysis of the
     parity-tested rebuild, scan-unrolled — see the constants below) at a
     generous 40% fp16 MFU of 989 TFLOP/s dense.
5. The bench.py anchor per family = 4x the batch-1 estimate (the
   deliberately reference-favouring convention set in round 1: the 128px
   anchor 250 img/s ~ 4x the ~60 img/s batch-1 number, granting the
   reference a batching mode it does not implement).

Run: python scripts/anchor_baseline.py
"""

import json
import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np
import torch

H100_FP16_PEAK = 989e12      # dense fp16/bf16 TFLOP/s (H100 SXM)
H100_EAGER_MFU = 0.40        # generous for the small kernels at batch 1
LAUNCH_US = 5.0              # per-kernel launch+dispatch overhead, eager

# useful FLOPs per image, forward: JAX XLA cost analysis of the rebuilt
# models with scan layers UNROLLED (cost analysis counts a lax.scan body
# once, so the scanned configs under-report; unrolled = exact). Recomputed
# round 4; drct128's 62.88 matches the 63e9 used since round 1.
FWD_FLOPS = {
    "drct128": 62.88e9,      # DRCT x4, LR 32, window 8
    "drct256": 298.15e9,     # DRCT x4, LR 64, window 16 (best-AUC geometry)
    "drn128": 49.60e9,       # DRN-L x4, LR 32 (40 blocks / 20 feats)
    "ead256": 83.12e9,       # EfficientAD-small maps (teacher+student+AE)
}


def build_drct(img_size=32, window_size=8):
    from reference_compat import import_reference
    TorchDRCT = import_reference("drct").DRCT
    opt = types.SimpleNamespace(
        img_size=img_size, n_colors=1, embed_dim=180, depths=(6,) * 12,
        num_heads=(6,) * 12, window_size=window_size, compress_ratio=3,
        squeeze_factor=30, conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0,
        upscale=4, img_range=1.0, upsampler="pixelshuffle",
        resi_connection="1conv")
    torch.manual_seed(0)
    m = TorchDRCT(opt)
    m.eval()
    return m, (1, img_size, img_size)


def build_drn():
    from reference_compat import import_reference
    TorchDRN = import_reference("drn").DRN
    # x4 scale table (src/main.py:172-182): 40 blocks, 20 feats, scale [2,4]
    opt = types.SimpleNamespace(
        scale=[2, 4], n_blocks=40, n_feats=20, n_colors=1, rgb_range=255,
        negval=0.2)
    torch.manual_seed(0)
    m = TorchDRN(opt)
    m.eval()
    return m, (1, 32, 32)


class _EADCombined(torch.nn.Module):
    """teacher+student+AE forward as the reference's predict composes them
    (src/efficientAD.py:292-309), minus the interpolation/normalise tail."""

    def __init__(self, teacher, student, ae):
        super().__init__()
        self.teacher, self.student, self.ae = teacher, student, ae

    def forward(self, x):
        t = self.teacher(x)
        s = self.student(x)
        a = self.ae(x)
        return t.sum() + s.sum() + a.sum()


def build_ead():
    from reference_compat import import_reference
    mod = import_reference("efficientAD")
    torch.manual_seed(0)
    teacher = mod.get_pdn_small(384)
    student = mod.get_pdn_small(768)   # student predicts 2*out_channels
    ae = mod.get_autoencoder(384)
    m = _EADCombined(teacher, student, ae)
    m.eval()
    return m, (3, 256, 256)


def time_forward(m, shape, batch, iters=3):
    x = torch.from_numpy(
        np.random.RandomState(0).rand(batch, *shape).astype(np.float32))
    with torch.no_grad():
        m(x)  # warm
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            m(x)
            times.append(time.perf_counter() - t0)
    return min(times)


def count_ops(m, shape):
    x = torch.zeros(1, *shape)
    with torch.no_grad(), torch.profiler.profile(
            activities=[torch.profiler.ProfilerActivity.CPU]) as prof:
        m(x)
    evts = [e for e in prof.events() if e.cpu_parent is None]
    return len(evts)


def family_row(name, m, shape):
    t1 = time_forward(m, shape, 1)
    n_ops = count_ops(m, shape)
    launch_bound = n_ops * LAUNCH_US * 1e-6                 # s/image, batch 1
    compute_bound = FWD_FLOPS[name] / (H100_FP16_PEAK * H100_EAGER_MFU)
    h100_batch1 = 1.0 / max(launch_bound, compute_bound)
    # batched serving the reference does not implement: launch overhead
    # amortises over a granted batch of 16, compute bound dominates
    h100_batched = 1.0 / max(launch_bound / 16, compute_bound)
    return {
        "cpu_batch1_ms": round(t1 * 1e3, 1),
        "ops_per_forward": n_ops,
        "h100_launch_bound_ms": round(launch_bound * 1e3, 2),
        "h100_compute_bound_ms": round(compute_bound * 1e3, 3),
        "h100_est_img_per_s_batch1": round(h100_batch1, 1),
        "h100_est_img_per_s_batch16": round(h100_batched, 1),
        # 4x batch-1 (the round-1 reference-favouring grace for the
        # launch-bound families), capped at the granted-batching estimate —
        # the grace factor models launch amortisation, so it cannot exceed
        # what full batching would deliver (EfficientAD is compute-bound
        # already at batch 1; 4x would be fiction there)
        "bench_anchor_img_per_s": round(min(4.0 * h100_batch1, h100_batched),
                                        0),
    }


def main():
    out = {}
    out["drct128"] = family_row("drct128", *build_drct(32, 8))
    out["drct256"] = family_row("drct256", *build_drct(64, 16))
    out["drn128"] = family_row("drn128", *build_drn())
    out["ead256"] = family_row("ead256", *build_ead())
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
