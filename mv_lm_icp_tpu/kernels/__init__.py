from . import nn_pallas, nn_window_pallas  # noqa: F401
