from . import (nn, nn_grid, nn_window, pca, quat, residuals,  # noqa: F401
               robust, se3, so3)
