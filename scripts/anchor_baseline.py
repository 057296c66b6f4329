"""Anchor the bench.py H100 reference-throughput denominator.

The reference publishes no throughput numbers (BASELINE.md), so bench.py's
``vs_baseline`` needs a defensible estimate of what the reference PyTorch
DRCT sustains on its H100. This script derives one from measurements that
ARE possible in this environment (torch CPU + the real reference model):

1. Build the real reference DRCT (src/drct.py:716-898) at the flagship
   config (embed 180, 12 RDGs, window 8, LR 32x32, x4, 1 channel).
2. Measure eager CPU latency at batch 1 (the reference's eval loop forwards
   ONE image at a time, src/evaluate.py:204-227) and batch 16.
3. Count dispatched ops per forward with torch.profiler — in eager CUDA
   each of these is >= 1 kernel launch.
4. H100 estimate = min(launch-bound, compute-bound):
   - launch-bound: n_ops x 5 us/launch (typical eager H100 launch+sync
     overhead for the tiny kernels this model produces: 64-token window
     attention, 180-ch convs at 32x32)
   - compute-bound: 63 GFLOP/image at a generous 40% fp16 MFU of 989
     TFLOP/s dense.

Run: python scripts/anchor_baseline.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np
import torch

FLOP_PER_IMAGE = 63e9        # useful FLOPs, DRCT fwd @ LR 32 x4 (ARCHITECTURE.md)
H100_FP16_PEAK = 989e12      # dense fp16/bf16 TFLOP/s (H100 SXM)
H100_EAGER_MFU = 0.40        # generous for 64-token windows at batch 1
LAUNCH_US = 5.0              # per-kernel launch+dispatch overhead, eager


def build_model():
    import types

    from reference_compat import import_reference
    TorchDRCT = import_reference("drct").DRCT
    opt = types.SimpleNamespace(
        img_size=32, n_colors=1, embed_dim=180, depths=(6,) * 12,
        num_heads=(6,) * 12, window_size=8, compress_ratio=3,
        squeeze_factor=30, conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0,
        upscale=4, img_range=1.0, upsampler="pixelshuffle",
        resi_connection="1conv")
    torch.manual_seed(0)
    m = TorchDRCT(opt)
    m.eval()
    return m


def time_forward(m, batch, iters=3):
    x = torch.from_numpy(
        np.random.RandomState(0).rand(batch, 1, 32, 32).astype(np.float32))
    with torch.no_grad():
        m(x)  # warm
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            m(x)
            times.append(time.perf_counter() - t0)
    return min(times)


def count_ops(m):
    x = torch.zeros(1, 1, 32, 32)
    with torch.no_grad(), torch.profiler.profile(
            activities=[torch.profiler.ProfilerActivity.CPU]) as prof:
        m(x)
    evts = [e for e in prof.events() if e.cpu_parent is None]
    return len(evts)


def main():
    m = build_model()
    t1 = time_forward(m, 1)
    t16 = time_forward(m, 16)
    n_ops = count_ops(m)
    launch_bound = n_ops * LAUNCH_US * 1e-6                 # s/image, batch 1
    compute_bound = FLOP_PER_IMAGE / (H100_FP16_PEAK * H100_EAGER_MFU)
    h100_batch1 = 1.0 / max(launch_bound, compute_bound)
    # batched serving: launch overhead amortises over the batch, compute
    # bound dominates; report both
    h100_batched = 1.0 / max(launch_bound / 16, compute_bound)
    print(json.dumps({
        "cpu_batch1_ms": round(t1 * 1e3, 1),
        "cpu_batch16_ms_per_img": round(t16 / 16 * 1e3, 1),
        "ops_per_forward": n_ops,
        "h100_launch_bound_ms": round(launch_bound * 1e3, 2),
        "h100_compute_bound_ms": round(compute_bound * 1e3, 3),
        "h100_est_img_per_s_batch1": round(h100_batch1, 1),
        "h100_est_img_per_s_batch16": round(h100_batched, 1),
    }, indent=2))


if __name__ == "__main__":
    main()
