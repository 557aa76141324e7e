from .builder import BuildConfig, build_layers
from .granne import Granne
from .graph import LayerStack
from . import schedule
