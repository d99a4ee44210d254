from ssnt_tts_tpu.models.decoder import (
    ARDecoderCell,
    FrameJoint,
    MelPrenet,
    TransitionJoint,
)
from ssnt_tts_tpu.models.encoder import DurationHead, TextEncoder, ToneHead
from ssnt_tts_tpu.models.ssnt import SSNTModel

__all__ = [
    "ARDecoderCell",
    "DurationHead",
    "FrameJoint",
    "MelPrenet",
    "SSNTModel",
    "TextEncoder",
    "ToneHead",
    "TransitionJoint",
]
