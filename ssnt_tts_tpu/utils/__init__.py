from ssnt_tts_tpu.utils import config

__all__ = ["config"]
