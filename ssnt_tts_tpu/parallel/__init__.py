from ssnt_tts_tpu.parallel import decode, mesh, multihost, train

__all__ = ["decode", "mesh", "multihost", "train"]
