from . import nn_pallas  # noqa: F401
