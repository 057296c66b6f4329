from adsr_tpu.ops.window_attention import window_attention

__all__ = ["window_attention"]
