from ssnt_tts_tpu.ops import (
    backtrace,
    beam_common,
    beam_v1,
    beam_v2,
    edit_distance,
    lattice,
    tone_latent,
    upsample,
)

__all__ = [
    "backtrace",
    "beam_common",
    "beam_v1",
    "beam_v2",
    "edit_distance",
    "lattice",
    "tone_latent",
    "upsample",
]
