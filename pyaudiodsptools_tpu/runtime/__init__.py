from . import native_lib
from .realtime import RealtimeEngine

__all__ = ["native_lib", "RealtimeEngine"]
