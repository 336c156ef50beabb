from .testimage import synth_face, synth_scene
from .timing import ElapseTime, profile_trace, time_jax

__all__ = ["synth_face", "synth_scene", "ElapseTime", "profile_trace",
           "time_jax"]
