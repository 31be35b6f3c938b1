from . import closedform, lm, multiview, posegraph  # noqa: F401
