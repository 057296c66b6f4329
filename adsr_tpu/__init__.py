"""adsr_tpu — TPU-native anomaly-detection-by-super-resolution framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the PyTorch
reference `Benedict3007/anomaly-detection-super-resolution` (see SURVEY.md):

- ``adsr_tpu.metrics``   — PSNR/SSIM formulas (numpy + jax), the numerical spec.
- ``adsr_tpu.core``      — typed configs, PRNG handling, device-mesh runtime.
- ``adsr_tpu.data``      — MVTec prep tool, synthetic fixtures, device pipeline.
- ``adsr_tpu.models``    — Flax models: DRN-L, DRCT, EfficientAD.
- ``adsr_tpu.ops``       — Pallas TPU kernels + XLA fallbacks (window attention,
                           box-filter/SSIM, pixel shuffle).
- ``adsr_tpu.parallel``  — data/tensor-parallel sharding over a jax Mesh.
- ``adsr_tpu.train``     — jitted train step, loss factory, epoch driver.
- ``adsr_tpu.eval``      — compiled anomaly evaluation graph + ROC-AUC.
- ``adsr_tpu.io``        — run dirs, logging, checkpoints, image export, plots.
- ``adsr_tpu.cli``       — train / evaluate / prepare / smoke entry points.
"""

__version__ = "0.1.0"
