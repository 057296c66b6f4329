"""Train entry point — flag surface parity with the reference CLI
(reference src/main.py:207-241) plus TPU-specific options.

    python -m adsr_tpu.cli.main --model-type drct --classe grid \
        --resolution 128 --scale 4 --epochs 2 --batch-size 4

New flags: --precision {bf16,fp32}, --dp/--tp mesh sizes, --resume.
--workers is accepted for compatibility and ignored (no loader processes:
the pipeline is a jitted device graph).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import List, Optional

from adsr_tpu.core.config import Experiment, MeshConfig, drct_experiment, \
    drn_experiment


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", type=str, default=None)
    pre_args, _ = pre.parse_known_args(argv)

    p = argparse.ArgumentParser(description="Training/Evaluation entrypoint",
                                parents=[pre])
    p.add_argument("--model-type", type=str, default="drct",
                   choices=["drct", "drn-l"])
    p.add_argument("--dataset", type=str, default="mvtec",
                   choices=["mvtec", "gkd", "gkd_large"])
    # mvtec uses grid|carpet; gkd uses DC0|DC2-style part classes
    p.add_argument("--classe", type=str, default="grid")
    p.add_argument("--scale", type=int, default=4, choices=[2, 4, 8])
    p.add_argument("--resolution", type=int, default=128,
                   choices=[32, 64, 128, 256, 512])
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--device", type=str, default="auto",
                   choices=["auto", "tpu", "cpu"])
    p.add_argument("--data-root", type=str, default="auto")
    p.add_argument("--save-dir", type=str, default="./workspace/experiment")
    p.add_argument("--pretrain", action="store_true")
    p.add_argument("--test-only", action="store_true")
    p.add_argument("--workers", type=int, default=0)  # compat; unused
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["bf16", "fp32"])
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--resume", action="store_true",
                   help="resume params+optimizer+step from the run dir")
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="epochs between full-train-state checkpoints "
                        "(0 = end of training only)")
    p.add_argument("--run-tag", type=str, default=None)
    # DRCT capacity overrides (full-size defaults match the reference)
    p.add_argument("--embed-dim", type=int, default=180)
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--num-heads", type=int, default=6)
    p.add_argument("--remat-policy", type=str, default="full",
                   choices=["full", "dots"],
                   help="DRCT backward remat granularity: 'full' recomputes "
                        "each RDG (min memory); 'dots' saves matmul outputs "
                        "(faster when activations fit HBM)")

    if pre_args.config is not None and os.path.isfile(pre_args.config):
        import yaml
        with open(pre_args.config) as f:
            cfg = yaml.safe_load(f) or {}
        p.set_defaults(**{k.replace("-", "_"): v for k, v in cfg.items()})

    return p.parse_args(argv)


def build_experiment(args: argparse.Namespace) -> Experiment:
    mesh = MeshConfig(dp=args.dp, tp=args.tp)
    common = dict(dataset=args.dataset,
                  classe=args.classe, resolution=args.resolution,
                  scale=args.scale, epochs=args.epochs,
                  batch_size=args.batch_size, lr=args.lr,
                  data_root=args.data_root, save_dir=args.save_dir,
                  no_augment=args.no_augment, seed=args.seed, mesh=mesh,
                  precision=args.precision, run_tag=args.run_tag)
    if args.model_type == "drn-l":
        pre = (f"workspace/pretrained_model_weights/DRNL{args.scale}x.msgpack"
               if args.pretrain else ".")
        pre_dual = (f"workspace/pretrained_model_weights/"
                    f"DRNL{args.scale}x_dual.msgpack" if args.pretrain else ".")
        exp = drn_experiment(pre_train=pre, pre_train_dual=pre_dual, **common)
    else:
        pre = ("workspace/pretrained_model_weights/drct_latest.msgpack"
               if args.pretrain else ".")
        exp = drct_experiment(pre_train=pre, embed_dim=args.embed_dim,
                              num_layers=args.num_layers,
                              num_heads=args.num_heads,
                              remat_policy=args.remat_policy, **common)
    import dataclasses
    exp = dataclasses.replace(exp, ckpt_every=args.ckpt_every)
    if args.test_only:
        exp = dataclasses.replace(exp, test_only=True)
    return exp


def train(exp: Experiment, resume: bool = False) -> None:
    from adsr_tpu.data.pipeline import load_sr_dataset
    from adsr_tpu.io.journal import Journal, load_params
    from adsr_tpu.train.trainer import Trainer

    journal = Journal(exp)
    journal.write_log(f"Using devices: {_device_summary()}")

    train_ds = None
    if not exp.test_only:
        train_ds = load_sr_dataset(exp.data.data_dir, exp.data.scale,
                                   exp.data.n_colors, exp.data.rgb_range)
    trainer = Trainer(exp, train_ds, None, journal=journal)
    n_params = sum(
        p.size for p in __import__("jax").tree_util.tree_leaves(
            trainer.state.params))
    journal.write_log(f"The number of parameters is {n_params / 1e6:.2f}M")

    if exp.pre_train != "." and os.path.isfile(exp.pre_train):
        journal.write_log(f"Loading model from {exp.pre_train}")
        primal = load_params(exp.pre_train, trainer.state.params["primal"])
        trainer.state = trainer.state.replace(
            params={**trainer.state.params, "primal": primal})
    if (exp.pre_train_dual != "." and os.path.isfile(exp.pre_train_dual)
            and "duals" in trainer.state.params):
        journal.write_log(f"Loading dual model from {exp.pre_train_dual}")
        duals = trainer.state.params["duals"]
        loaded = load_params(exp.pre_train_dual,
                             {str(i): d for i, d in enumerate(duals)})
        trainer.state = trainer.state.replace(
            params={**trainer.state.params,
                    "duals": tuple(loaded[str(i)]
                                   for i in range(len(duals)))})
    if resume:
        try:
            trainer.state = journal.load_train_state(trainer.state)
            trainer.epoch = int(trainer.state.step) // max(
                trainer.sampler.batches_per_epoch, 1) if trainer.sampler else 0
            journal.write_log(f"Resumed at step {int(trainer.state.step)} "
                              f"(epoch {trainer.epoch})")
        except FileNotFoundError:
            journal.write_log("No train state to resume; starting fresh")
    if (exp.pre_train != "." and os.path.isfile(exp.pre_train)) or resume:
        # loaded params can carry LN scales the init-time exp2 score-bound
        # check never saw — re-run the guard on what will actually train
        trainer.apply_softmax_guard()

    # preemption handling: SIGTERM/SIGINT finish the current epoch, save the
    # full train state (params+optimizer+step), and exit resumable — the
    # failure-recovery story the reference lacks (SURVEY.md section 5.3)
    import signal
    preempted = {"flag": False}

    def _on_signal(signum, frame):
        preempted["flag"] = True
        journal.write_log(f"Signal {signum}: will checkpoint and stop after "
                          "this epoch")

    old_handlers = {s: signal.signal(s, _on_signal)
                    for s in (signal.SIGTERM, signal.SIGINT)}

    ck = exp.ckpt_every
    start = time.time()
    while not trainer.terminate():
        trainer.train_one_epoch()
        if (ck and trainer.epoch % ck == 0) or preempted["flag"]:
            journal.save_train_state(trainer.state)
        journal.log_metrics({"epoch": trainer.epoch,
                             "step": int(trainer.state.step),
                             **trainer.loss_history[-1]})
        if preempted["flag"]:
            journal.write_log("Preempted: state saved; resume with --resume")
            journal.done()
            return
    for s, h in old_handlers.items():
        signal.signal(s, h)
    journal.write_log(
        f"Total Training Time: {(time.time() - start) / 3600:.2f}")

    # post-train PSNR/SSIM eval on val/good (src/main.py:317-332, 368-383)
    try:
        val_dir = f"{exp.data.data_root}/{exp.data.classe}/val/good"
        val_ds = load_sr_dataset(val_dir, exp.data.scale, exp.data.n_colors,
                                 exp.data.rgb_range)
        import dataclasses
        trainer.exp = dataclasses.replace(
            exp, data=dataclasses.replace(exp.data, data_test="mvtec_val_good"))
        trainer.test(val_ds,
                     save_results_fn=(
                         lambda name, sr: journal.save_result_image(
                             name, sr, max(exp.data.scale), "mvtec_val_good"))
                     if exp.save_results else None)
    except Exception as e:  # parity: evaluation failures are non-fatal
        journal.write_log(f"Evaluation skipped due to error: {e}")

    journal.write_log("Skipping anomaly AUC on validation (good-only split)")
    journal.save(trainer, is_best=True)
    journal.done()


def _device_summary() -> str:
    import jax
    return ", ".join(str(d) for d in jax.devices())


def main(argv: Optional[List[str]] = None) -> None:
    args = parse_args(argv)
    from adsr_tpu.core.runtime import setup_compilation_cache
    setup_compilation_cache()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    print(f"Model: {args.model_type}")
    print(f"Dataset: {args.dataset}")
    print(f"Class: {args.classe}")
    print(f"Resolution: {args.resolution}")
    print(f"Scale: {args.scale}")

    exp = build_experiment(args)
    train(exp, resume=args.resume)


if __name__ == "__main__":
    main()
