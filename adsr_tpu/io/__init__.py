from adsr_tpu.io.journal import Journal, load_params, save_params

__all__ = ["Journal", "load_params", "save_params"]
