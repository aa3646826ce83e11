from .lattice import *  # noqa: F401,F403
from .render import *  # noqa: F401,F403
