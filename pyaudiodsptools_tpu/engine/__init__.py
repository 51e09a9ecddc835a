from .chain import Chain
from .render import render, render_file
from .stream import StreamProcessor

__all__ = ["Chain", "render", "render_file", "StreamProcessor"]
