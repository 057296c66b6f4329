#!/usr/bin/env python3
"""Project convenience CLI (reference run.py:97-128 equivalent).

    python run.py setup   # create workspace/data directory scaffolding
    python run.py test    # fast test suite (CPU, virtual 8-device mesh)
    python run.py smoke   # hermetic end-to-end smoke (synthetic data)
    python run.py clean   # wipe workspace/ and generated data
    python run.py help
"""

import shutil
import subprocess
import sys
from pathlib import Path

DIRS = ["data", "workspace", "workspace/experiment", "results"]


def setup() -> int:
    for d in DIRS:
        Path(d).mkdir(parents=True, exist_ok=True)
        print(f"  ok {d}/")
    print("Setup complete.")
    return 0


def test(all_tests: bool = False) -> int:
    """Fast lane (CI): deselects @slow. ``run.py test --all`` runs everything
    (compile-heavy trainer/checkpoint/window-16 tests included)."""
    cmd = [sys.executable, "-m", "pytest", "tests/", "-x", "-q"]
    if not all_tests:
        cmd += ["-m", "not slow"]
    return subprocess.call(cmd)


def smoke() -> int:
    return subprocess.call([sys.executable, "-m", "adsr_tpu.cli.smoke",
                            "--workdir", "workspace/smoke", "--device", "cpu"])


def clean() -> int:
    for d in ("workspace", "results"):
        if Path(d).exists():
            shutil.rmtree(d)
            print(f"  removed {d}/")
    for p in Path("data").glob("mvtec_*"):
        shutil.rmtree(p)
        print(f"  removed {p}/")
    print("Clean complete.")
    return 0


def help_() -> int:
    print(__doc__)
    return 0


COMMANDS = {"setup": setup, "test": test, "smoke": smoke, "clean": clean,
            "help": help_}

if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "help"
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd}")
        help_()
        sys.exit(2)
    if cmd == "test":
        sys.exit(test(all_tests="--all" in sys.argv[2:]))
    sys.exit(COMMANDS[cmd]())
