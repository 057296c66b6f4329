"""End-to-end smoke test (reference scripts/smoke_test.py:36-152 equivalent).

prepare (synthetic) -> train via the real CLI in a subprocess -> locate the
newest run dir -> evaluate via the real CLI in a subprocess. Crosses process
boundaries exactly like the reference smoke test so the full flag surface is
exercised.

    python -m adsr_tpu.cli.smoke --workdir /tmp/adsr_smoke [--full-size]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path


def run(cmd, cwd):
    print("+", " ".join(cmd))
    proc = subprocess.run(cmd, cwd=cwd)
    if proc.returncode != 0:
        raise SystemExit(f"step failed ({proc.returncode}): {' '.join(cmd)}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=str, default="workspace/smoke")
    p.add_argument("--resolution", type=int, default=32)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--model-type", type=str, default="drct",
                   choices=["drct", "drn-l"])
    p.add_argument("--full-size", action="store_true",
                   help="use reference-size DRCT instead of the tiny smoke one")
    args = p.parse_args(argv)

    wd = Path(args.workdir).absolute()
    wd.mkdir(parents=True, exist_ok=True)
    py = sys.executable
    env_cwd = str(wd)
    repo = str(Path(__file__).resolve().parents[2])
    os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")

    # 1. prepare synthetic grid data
    run([py, "-m", "adsr_tpu.cli.prepare", "--hr-size", str(args.resolution),
         "--scales", "4", "--classes", "grid", "--synthetic"], env_cwd)

    # 2. train
    train_cmd = [py, "-m", "adsr_tpu.cli.main", "--model-type",
                 args.model_type, "--classe", "grid", "--resolution",
                 str(args.resolution), "--scale", "4", "--epochs",
                 str(args.epochs), "--batch-size", "4", "--device",
                 args.device, "--run-tag", "smoke"]
    if args.model_type == "drct" and not args.full_size:
        train_cmd += ["--embed-dim", "24", "--num-layers", "1",
                      "--num-heads", "2"]
    run(train_cmd, env_cwd)

    # 3. newest run dir
    exp_root = wd / "workspace" / "experiment" / args.model_type
    run_dirs = sorted(exp_root.glob("mvtec_grid_*"), key=os.path.getmtime)
    if not run_dirs:
        raise SystemExit(f"no run dir under {exp_root}")
    run_dir = run_dirs[-1]
    print(f"run dir: {run_dir}")

    # 4. evaluate
    json_out = wd / "smoke_eval.json"
    run([py, "-m", "adsr_tpu.cli.evaluate", "--run-dir", str(run_dir),
         "--device", args.device, "--json-out", str(json_out)], env_cwd)

    result = json.loads(json_out.read_text())
    print(f"SMOKE OK  auc_ssim={result['auc_ssim']:.3f} "
          f"auc_mse={result['auc_mse']:.3f} auc_psnr={result['auc_psnr']:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
