from . import (nn, nn_grid, pca, quat, residuals, robust, se3,  # noqa: F401
               so3)
