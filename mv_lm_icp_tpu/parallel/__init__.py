from . import mesh, sharded  # noqa: F401
from .mesh import make_mesh  # noqa: F401
