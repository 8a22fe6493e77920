from .conv import MessagePassing  # noqa: F401
from .gcn_conv import GCNConv  # noqa: F401
from . import inits  # noqa: F401
