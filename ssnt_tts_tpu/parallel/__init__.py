from ssnt_tts_tpu.parallel import decode, mesh, train

__all__ = ["decode", "mesh", "train"]
