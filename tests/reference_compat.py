"""Import helper for the reference torch code under /root/reference.

The reference modules import skimage/imageio/tqdm/torchvision/tifffile at top
level without using them in the model classes themselves; stub whichever are
missing in this environment so `import src.<mod>` succeeds. Used by parity
tests that compare our Flax models against the real reference torch models.
"""

import sys
import types

_STUBBABLE = ("skimage", "skimage.color", "skimage.metrics", "imageio",
              "imageio.v2", "tqdm", "tifffile", "torchvision",
              "torchvision.transforms", "torchvision.datasets")


def _install_stubs():
    for mod in _STUBBABLE:
        try:
            __import__(mod)
        except (ImportError, TypeError):
            stub = types.ModuleType(mod)

            def _getattr(name):
                if name.startswith("__"):
                    raise AttributeError(name)
                # a class supports both calling AND subclassing (the
                # reference subclasses torchvision's ImageFolder)
                return type(name, (object,),
                            {"__init__": lambda self, *a, **k: None})

            stub.__getattr__ = _getattr
            stub.__path__ = []  # so `import pkg.sub` consults sys.modules
            sys.modules[mod] = stub
            if "." in mod:
                parent, child = mod.rsplit(".", 1)
                setattr(sys.modules[parent], child, stub)


def import_reference(module: str):
    """Import `src.<module>` from /root/reference, or raise ImportError."""
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib
    return importlib.import_module(f"src.{module}")
