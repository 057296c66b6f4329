"""API-surface sanity checks (the reference's test_basic.py:9-60 equivalent,
extended to the full public surface)."""

import importlib

import pytest


PUBLIC_MODULES = [
    "adsr_tpu",
    "adsr_tpu.metrics",
    "adsr_tpu.core", "adsr_tpu.core.config", "adsr_tpu.core.mesh",
    "adsr_tpu.core.prng", "adsr_tpu.core.runtime",
    "adsr_tpu.data", "adsr_tpu.data.pipeline", "adsr_tpu.data.prepare",
    "adsr_tpu.data.synthetic",
    "adsr_tpu.models", "adsr_tpu.models.drn", "adsr_tpu.models.drct",
    "adsr_tpu.models.efficientad", "adsr_tpu.models.factory",
    "adsr_tpu.ops", "adsr_tpu.ops.window_attention",
    "adsr_tpu.parallel", "adsr_tpu.parallel.sharding",
    "adsr_tpu.train", "adsr_tpu.train.trainer", "adsr_tpu.train.losses",
    "adsr_tpu.train.efficientad",
    "adsr_tpu.eval", "adsr_tpu.eval.evaluate", "adsr_tpu.eval.auc",
    "adsr_tpu.eval.serving", "adsr_tpu.eval.disk", "adsr_tpu.eval.rundir",
    "adsr_tpu.io", "adsr_tpu.io.journal", "adsr_tpu.io.torch_convert",
    "adsr_tpu.utils", "adsr_tpu.utils.profiling", "adsr_tpu.utils.image",
]


@pytest.mark.parametrize("mod", PUBLIC_MODULES)
def test_imports(mod):
    importlib.import_module(mod)


def test_cli_parse_args_exist():
    from adsr_tpu.cli.main import parse_args as train_parse
    from adsr_tpu.cli.evaluate import parse_args as eval_parse
    a = train_parse([])
    assert a.model_type == "drct" and a.classe == "grid"
    assert a.resolution == 128 and a.scale == 4
    e = eval_parse([])
    assert e.batch_size == 8


def test_cli_flag_surface_parity():
    """The reference's flag surface (main.py:215-231) is accepted."""
    from adsr_tpu.cli.main import parse_args
    a = parse_args(["--model-type", "drn-l", "--dataset", "mvtec",
                    "--classe", "carpet", "--scale", "8",
                    "--resolution", "256", "--epochs", "5",
                    "--batch-size", "2", "--lr", "1e-4", "--no-augment",
                    "--device", "cpu", "--data-root", "x", "--save-dir", "y",
                    "--pretrain", "--test-only", "--workers", "2"])
    assert a.model_type == "drn-l" and a.no_augment and a.pretrain


def test_graft_entry_surface():
    import __graft_entry__ as g
    assert callable(g.entry) and callable(g.dryrun_multichip)
