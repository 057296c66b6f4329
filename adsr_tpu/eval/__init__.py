from adsr_tpu.eval.auc import roc_auc
from adsr_tpu.eval.evaluate import evaluate_anomaly
from adsr_tpu.eval.rundir import infer_from_run_dir, resolve_checkpoint

__all__ = ["roc_auc", "evaluate_anomaly", "infer_from_run_dir",
           "resolve_checkpoint"]
