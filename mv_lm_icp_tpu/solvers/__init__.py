from . import closedform  # noqa: F401
