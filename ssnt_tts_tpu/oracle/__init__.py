from ssnt_tts_tpu.oracle import numpy_oracle

__all__ = ["numpy_oracle"]
